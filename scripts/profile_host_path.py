#!/usr/bin/env python
"""Per-phase wall profile of the exact product path (alignPairs + annotate)
on the bench workload — identifies where the host-orchestrated time goes
before rebuilding it on the fast device stages."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np

from bench import buildWorld, simulateBatch

TIMES: dict = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        TIMES[name] = TIMES.get(name, 0.0) + (time.time() - t0)
        return out

    return wrap


def main():
    print(f"devices: {jax.devices()}", flush=True)
    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    n_pairs = 2000 if os.environ.get("BENCH_SMALL") else 30000
    c1, l1, c2, l2 = simulateBatch(genes, index, n_pairs)

    from kir_graph_tpu.align import pipeline as pl
    from kir_graph_tpu.align.annotate import VariantAnnotator

    aligner = pl.GraphAligner(index)
    annotator = VariantAnnotator(index)

    t0 = time.time()
    aligner.alignPairs(c1, l1, c2, l2)
    print(f"warm alignPairs (incl compile): {time.time() - t0:.1f}s", flush=True)

    # instrument (round-2 structure: one fused pre-traceback device
    # dispatch, sliced traceback jobs); block on device outputs inside
    # each wrapper so the wall time lands on the right phase
    def timedSync(name, fn):
        def wrap(*a, **k):
            t0 = time.time()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            TIMES[name] = TIMES.get(name, 0.0) + (time.time() - t0)
            return out

        return wrap

    # the whole pre-traceback device phase is one fused dispatch
    aligner._device_mono = timedSync("deviceMono", aligner._device_mono)
    aligner._tracebackJobs = timed("tracebackJobs", aligner._tracebackJobs)
    pl.revCompCodes = timed("hostRevComp", pl.revCompCodes)

    os.environ["KGT_PROFILE"] = "1"
    pl.SEG_TIMES.clear()
    t0 = time.time()
    result = aligner.alignPairs(c1, l1, c2, l2)
    total = time.time() - t0
    # the product path consumes EvidenceArrays via annotateEvidence (the
    # native core when built); the PairRead-materialising annotate() is
    # the JSON/compat boundary only.  Novel-SNV registration is
    # cumulative BY DESIGN across batches, so each timing uses a fresh
    # annotator (re-annotating one batch twice would double-register).
    from kir_graph_tpu.align.annotate import VariantAnnotator as _VA

    t0 = time.time()
    _VA(index).annotateEvidence(result)
    t_ann_cold = time.time() - t0
    t0 = time.time()
    _VA(index).annotateEvidence(result)
    t_ann = time.time() - t0
    print(f"annotateEvidence cold: {t_ann_cold:.2f}s, warm: {t_ann:.2f}s")
    t0 = time.time()
    _VA(index).annotate(result)
    t_compat = time.time() - t0
    print(f"annotate (PairRead compat boundary): {t_compat:.2f}s")

    n_reads = 2 * len(c1)
    print(f"alignPairs total: {total:.2f}s ({n_reads/total:,.0f} reads/s)")
    for k, v in sorted(TIMES.items(), key=lambda kv: -kv[1]):
        print(f"  {k:>16}: {v:6.2f}s")
    other = total - sum(TIMES.values())
    print(f"  {'host numpy/other':>16}: {other:6.2f}s")
    if pl.SEG_TIMES:
        print("  host segments (KGT_PROFILE):")
        for k, v in sorted(pl.SEG_TIMES.items(), key=lambda kv: -kv[1]):
            print(f"    {k:>18}: {v:6.3f}s")
    print(f"annotateEvidence: {t_ann:.2f}s")
    print(f"product path: {n_reads/(total+t_ann):,.0f} reads/s")


if __name__ == "__main__":
    main()
