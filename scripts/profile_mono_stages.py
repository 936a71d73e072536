#!/usr/bin/env python
"""Attribute the fused pre-traceback device phase: compile monolith
prefixes (prep | +seed | +score | +pairSelect) and time each synced.
XLA dead-code-eliminates the stages after the returned value, so each
prefix measures exactly the live computation."""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np

from bench import buildWorld, simulateBatch


def main():
    print(f"devices: {jax.devices()}", flush=True)
    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    n_pairs = 2000 if os.environ.get("BENCH_SMALL") else 30000
    c1, l1, c2, l2 = simulateBatch(genes, index, n_pairs)

    from kir_graph_tpu.align import pipeline as pl
    from kir_graph_tpu.align.pipeline import GraphAligner, _prepStreams
    from kir_graph_tpu.align.seeding import _findCandidates
    from kir_graph_tpu.native_io import packUploadNative
    from kir_graph_tpu.parallel.cohort import (
        _selRows, decodeCandidates, scoreDenseGrid,
    )

    a = GraphAligner(index)
    table, p = a.table, a.p
    md, C = table.max_diag, a.top_c
    RL = p.read_len
    N = len(c1)
    Nb = a._bucket(N, a.CHUNK_PAIRS)
    pad = Nb - N
    c1p = np.concatenate([c1, np.full((pad, RL), 4, np.int8)])
    c2p = np.concatenate([c2, np.full((pad, RL), 4, np.int8)])
    l1p = np.concatenate([l1, np.full(pad, 1, np.int32)]).astype(np.int32)
    l2p = np.concatenate([l2, np.full(pad, 1, np.int32)]).astype(np.int32)
    W = RL // 2 + 2
    buf = np.zeros((2 * Nb, W), np.uint8)
    assert packUploadNative(c1p, c2p, l1p, l2p, buf)
    buf_d = jnp.asarray(buf)

    def stagePrep(b):
        return _prepStreams(b, RL)

    def stageSeed(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL)
        cand, votes = _findCandidates(
            codes_fwd, lens_dev, table.bkeys, table.padded, table.lut,
            table.k, a.stride, a.max_postings, C, table.n_genes, md,
            a.min_votes,
        )
        return cand, votes

    def stageScore(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL)
        cand, _ = _findCandidates(
            codes_fwd, lens_dev, table.bkeys, table.padded, table.lut,
            table.k, a.stride, a.max_postings, C, table.n_genes, md,
            a.min_votes,
        )
        gene, orient, diag = decodeCandidates(cand, md)
        return scoreDenseGrid(
            a.arr.win, md, p, codes_dev, lens_dev, gene, diag,
            sel=_selRows(orient, Nb), use_pallas=a.use_pallas,
        )

    def stageScoreXla(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL)
        cand, _ = _findCandidates(
            codes_fwd, lens_dev, table.bkeys, table.padded, table.lut,
            table.k, a.stride, a.max_postings, C, table.n_genes, md,
            a.min_votes,
        )
        gene, orient, diag = decodeCandidates(cand, md)
        return scoreDenseGrid(
            a.arr.win, md, p, codes_dev, lens_dev, gene, diag,
            sel=_selRows(orient, Nb), use_pallas=False,
        )

    stages = [
        ("prep", jax.jit(stagePrep, static_argnums=())),
        ("+seed", jax.jit(stageSeed)),
        ("+score", jax.jit(stageScore)),
        ("+score (xla dp)", jax.jit(stageScoreXla)),
        ("+pairSelect (full mono)", lambda b: a._device_mono(b, RL)),
    ]
    for name, fn in stages:
        out = fn(buf_d)
        jax.block_until_ready(out)
        times = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(buf_d))
            times.append(time.time() - t0)
        print(f"{name:>24}: {min(times)*1e3:7.1f} ms  "
              f"(median {sorted(times)[2]*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
