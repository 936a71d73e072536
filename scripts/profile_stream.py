#!/usr/bin/env python
"""One-shot vs pipelined (align/stream.py) exact-path wall times at
several chunk sizes — picks the stream chunk for this host/link.  The
tunneled TPU adds per-dispatch and per-download latency that a local
chip doesn't have, so the best chunk is a measurement, not a constant."""
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
    from kir_graph_tpu.align.stream import alignAnnotateStream

    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    n_reads = 2 * len(c1)

    def timeIt(label, fn, iters=3):
        fn()  # warm
        best = min(
            (lambda t0=time.time(): (fn(), time.time() - t0)[1])()
            for _ in range(iters)
        )
        print(f"{label:>24}: {best:5.2f}s  ({n_reads/best:,.0f} reads/s)",
              flush=True)
        return best

    def oneShot():
        r = aligner.alignPairs(c1, l1, c2, l2)
        annotator.annotate(r)

    timeIt("one-shot", oneShot)
    for chunk in (16384, 8192, 4096):
        timeIt(
            f"stream chunk={chunk}",
            lambda c=chunk: alignAnnotateStream(
                aligner, annotator, c1, l1, c2, l2, chunk=c
            ),
        )
    timeIt("one-shot (again)", oneShot)


if __name__ == "__main__":
    main()
