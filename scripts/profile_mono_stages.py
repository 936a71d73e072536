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
        decodeCandidates, scoreDenseGrid,
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

    from kir_graph_tpu.align.pipeline import _uniformLen
    UL = _uniformLen(l1p, l2p)  # production passes this; without it
    # revcomp degrades to the take_along_axis path and the profile
    # measures a program the product never runs

    def stagePrep(b):
        return _prepStreams(b, RL, uniform_len=UL)

    def stageSeed(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL, uniform_len=UL)
        cand, votes = _findCandidates(
            codes_fwd, lens_dev, table.merged,
            table.k, a.stride, C, table.n_genes, md, a.min_votes,
        )
        return cand, votes

    def stageScore(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL, uniform_len=UL)
        cand, _ = _findCandidates(
            codes_fwd, lens_dev, table.merged,
            table.k, a.stride, C, table.n_genes, md, a.min_votes,
        )
        gene, orient, diag = decodeCandidates(cand, md)
        return scoreDenseGrid(
            a.arr.win, md, p, codes_dev, lens_dev, gene, diag,
            orient=orient, use_pallas=a.use_pallas,
        )

    def stageSeedVotes(b):
        """Seed WITHOUT the vote sort/count/top-k: stops at the raw vote
        stream (isolates gather cost from sort cost)."""
        from kir_graph_tpu.align.seeding import (
            DIAG_BUCKET, LUT_BITS, POS_BITS, _packKmers,
        )

        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL, uniform_len=UL)
        keys, offsets, valid, qflip = _packKmers(codes_fwd, table.k, a.stride)
        R, S = keys.shape
        Wrow = table.merged.shape[1]
        Wc = (2 * (Wrow - 1)) // 3
        Wt = Wrow - 1 - Wc
        pre = (keys >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
        row = jnp.take(table.merged, pre, axis=0)
        tag_pairs = row[:, :, :Wt]
        tags = jnp.stack(
            [tag_pairs & jnp.uint32(0xFFFF), tag_pairs >> jnp.uint32(16)],
            axis=-1,
        ).reshape(R, S, 2 * Wt)[:, :, :Wc]
        packed_p = row[:, :, Wt:Wt + Wc]
        cnt = row[:, :, Wrow - 1].astype(jnp.int32)
        key16 = (keys & jnp.uint32(0xFFFF))[:, :, None]
        slot = jnp.arange(Wc)
        p_ok = (
            valid[:, :, None]
            & (tags == key16)
            & (slot[None, None, :] < cnt[:, :, None])
        )
        gene = (packed_p >> (POS_BITS + 1)).astype(jnp.int32)
        pflip = ((packed_p >> POS_BITS) & 1).astype(jnp.int32)
        pos = (packed_p & ((1 << POS_BITS) - 1)).astype(jnp.int32)
        orient = pflip ^ qflip.astype(jnp.int32)[:, :, None]
        off_fwd = offsets[None, :, None]
        off_rc = lens_dev[:, None, None] - table.k - off_fwd
        diag = jnp.maximum(
            pos - jnp.where(orient == 1, off_rc, off_fwd), 0
        )
        vote = (gene * 2 + orient) * md + diag // DIAG_BUCKET
        SENT = table.n_genes * 2 * md + 1
        return jnp.where(p_ok, vote, SENT).reshape(R, S * Wc)

    def stageScoreXla(b):
        codes_dev, codes_fwd, lens_dev = _prepStreams(b, RL, uniform_len=UL)
        cand, _ = _findCandidates(
            codes_fwd, lens_dev, table.merged,
            table.k, a.stride, C, table.n_genes, md, a.min_votes,
        )
        gene, orient, diag = decodeCandidates(cand, md)
        return scoreDenseGrid(
            a.arr.win, md, p, codes_dev, lens_dev, gene, diag,
            orient=orient, use_pallas=False,
        )

    stages = [
        ("prep", jax.jit(stagePrep, static_argnums=())),
        ("seed votes (no sort)", jax.jit(stageSeedVotes)),
        ("+seed", jax.jit(stageSeed)),
        ("+score", jax.jit(stageScore)),
        ("+pairSelect (full mono)", lambda b: a._device_mono(b, RL, UL)),
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
