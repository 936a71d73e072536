#!/usr/bin/env python
"""Wall-clock segment attribution of ONE streamed iteration (the
product's bulk path: align/stream.py over 4 x CHUNK_PAIRS chunks).

Unlike the per-stage jit profiles (profile_mono_stages.py), this
measures the REAL driver — host blocking points (winner/traceback
downloads), overlap effectiveness, and the untracked remainder (host
annotate + evidence merge run inside the host_work window).  The
round-4 upload-prefetch and fused-traceback wins were found with this
attribution (docs/BENCH_NOTES.md).
"""
import os
import sys
import time

os.environ["KGT_PROFILE"] = "1"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

from bench import buildWorld, simulateBatch


def main():
    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner, SEG_TIMES
    from kir_graph_tpu.align.stream import alignAnnotateEvidence

    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    base = 2000 if os.environ.get("BENCH_SMALL") else 30000
    c1, l1, c2, l2 = simulateBatch(genes, index, base)
    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    chunk = 2048 if os.environ.get("BENCH_SMALL") else aligner.CHUNK_PAIRS
    n_big = 4 * chunk
    reps = (n_big + len(c1) - 1) // len(c1)
    cb1 = np.concatenate([c1] * reps)[:n_big]
    lb1 = np.concatenate([l1] * reps)[:n_big]
    cb2 = np.concatenate([c2] * reps)[:n_big]
    lb2 = np.concatenate([l2] * reps)[:n_big]

    # warm (compile)
    _, sdepth, _ = alignAnnotateEvidence(
        aligner, annotator, cb1, lb1, cb2, lb2, chunk=chunk
    )
    jax.block_until_ready(sdepth)

    SEG_TIMES.clear()
    t0 = time.time()
    _, sdepth, _ = alignAnnotateEvidence(
        aligner, annotator, cb1, lb1, cb2, lb2, chunk=chunk
    )
    jax.block_until_ready(sdepth)
    dt = time.time() - t0
    print(
        f"total {dt * 1e3:.0f} ms for 4x{chunk} chunks -> "
        f"{2 * n_big / dt:,.0f} reads/s"
    )
    acc = 0.0
    for k, v in sorted(SEG_TIMES.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v * 1e3:8.1f} ms")
        acc += v
    print(
        f"  {'(tracked)':24s} {acc * 1e3:8.1f} ms  "
        f"untracked {(dt - acc) * 1e3:8.1f} ms"
    )


if __name__ == "__main__":
    main()
