"""Attribute per-gene typing wall time on the live backend.

Times each phase of the product typing tail (fromEvidence count build,
logProbsFromCounts dispatch+download, beam steps, fraction, f64 rescore)
for every gene of the bench-scale world, so the BENCH_NOTES budget for
typing_s_per_sample is measured, not guessed.  KGT_* env knobs apply.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import bench as B

    small = bool(os.environ.get("BENCH_SMALL"))
    genes, index = B.buildWorld(small)
    c1, l1, c2, l2 = B.simulateBatch(genes, index, 2000 if small else 30000)

    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner
    from kir_graph_tpu.align.stream import alignAnnotateEvidence
    from kir_graph_tpu.typing.allele_typing import AlleleTyping, rescoreF64

    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    ev, depth, pileup = alignAnnotateEvidence(aligner, annotator, c1, l1, c2, l2)
    bundle = annotator.evidenceBundle(ev)
    gene_ev, gene_vars = bundle.splitByGene()
    log(f"[prof] platform={jax.default_backend()} genes={len(gene_ev)}")

    tot = {}

    def mark(key, t0):
        dt = time.time() - t0
        tot[key] = tot.get(key, 0.0) + dt
        return time.time()

    t_all = time.time()
    for gname in sorted(gene_ev):
        t0 = time.time()
        model = AlleleTyping.fromEvidence(
            gene_ev[gname], gene_vars[gname], top_n=600
        )
        jax.block_until_ready(model._log_probs_dev)
        t0 = mark("fromEvidence", t0)
        R, A = model.log_probs.shape
        # CN=2 non-homo: two addCandidate steps
        model.force_homo = False
        model.result = []
        model.addCandidate()
        t0 = mark("beam_step1", t0)
        model.addCandidate()
        t0 = mark("beam_step2", t0)
        res = model.result[-1]
        if res.value.shape[0]:
            rescoreF64(res, model.logProbs64())
        t0 = mark("rescore_f64", t0)
        log(f"[prof] {gname}: R={R} A={A}")
    log(f"[prof] total {time.time() - t_all:.2f}s")
    for k, v in sorted(tot.items(), key=lambda kv: -kv[1]):
        log(f"[prof]   {k:>14s} {v:7.2f}s")


if __name__ == "__main__":
    main()
