#!/usr/bin/env python
"""Split the annotate wall time into the native classification core vs
the host assembly (toPairReads + catalog) — decides how much a
device-side classification phase can save."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

from bench import buildWorld, simulateBatch


def main():
    print(f"devices: {jax.devices()}", flush=True)
    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    n_pairs = 2000 if os.environ.get("BENCH_SMALL") else 30000
    c1, l1, c2, l2 = simulateBatch(genes, index, n_pairs)

    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner

    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    result = aligner.alignPairs(c1, l1, c2, l2)

    impl = annotator._impl()
    # warm
    ev, depth, pileup = impl(result)
    annotator.assembleReadsData(ev, depth, pileup)

    for _ in range(3):
        t0 = time.time()
        ev, depth, pileup = impl(result)
        t_core = time.time() - t0
        t0 = time.time()
        variants = annotator.catalogVariants() + ev.novel_variants
        t_cat = time.time() - t0
        t0 = time.time()
        reads = annotator.toPairReads(ev)
        t_tpr = time.time() - t0
        print(
            f"native core {t_core:.3f}s, catalog {t_cat:.3f}s, "
            f"toPairReads {t_tpr:.3f}s  (reads {len(reads)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
