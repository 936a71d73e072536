"""
K-mer seeding: reads -> candidate (gene, diagonal) placements.

Replaces HISAT2's graph FM-index seed phase.  The sorted k-mer hash table
(index/build.py:buildKmerTable) lives in HBM; lookups are a vectorised
binary search (searchsorted) and candidate selection is a per-read
sort + run-count + top-k — all XLA-friendly dense int32/uint32 ops
(TPU has no 64-bit integer path).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import KMER_MIX1, KMER_MIX2

DIAG_BUCKET = 16


POS_BITS = 17   # posting = gene << POS_BITS | position (one gather, not two)
LUT_BITS = 18   # key-prefix LUT: top bits -> bucket range in the sorted keys


@dataclass
class SeedTable:
    """Device-resident k-mer table + geometry constants."""

    keys: jax.Array       # [U] uint32 sorted hashes
    start: jax.Array      # [U+1] int32
    packed: jax.Array     # [P] uint32 (gene << POS_BITS | pos)
    lut: jax.Array        # [2^LUT_BITS + 1] int32 prefix bucket starts
    lut_steps: int        # binary-search steps within the widest bucket
    max_post: int         # longest posting list (gather-cap ceiling)
    k: int
    n_genes: int
    max_diag: int

    @classmethod
    def fromIndex(cls, index) -> "SeedTable":
        Lmax = int(index.backbone.shape[1])
        assert Lmax < (1 << POS_BITS)
        packed = (
            index.kmer_gene.astype(np.uint32) << POS_BITS
        ) | index.kmer_pos.astype(np.uint32)

        # reorder each key's posting list round-robin over genes, so a
        # query-time posting cap drops same-gene repeats before it ever
        # drops a gene's only placement (gathers cost per slot whether
        # masked or not, so the cap is a real lever)
        lens = np.diff(index.kmer_start)
        if len(lens) and int(lens.max()) > 1:
            seg = np.repeat(
                np.arange(len(lens), dtype=np.int64), lens
            )
            gene = index.kmer_gene.astype(np.int64)
            by_sg = np.argsort((seg << 20) | gene, kind="stable")
            ks = (seg << 20 | gene)[by_sg]
            new_grp = np.r_[True, ks[1:] != ks[:-1]]
            pos_in = np.arange(len(ks))
            occ_sorted = pos_in - np.maximum.accumulate(
                np.where(new_grp, pos_in, 0)
            )
            occ = np.empty_like(occ_sorted)
            occ[by_sg] = occ_sorted
            occ = np.minimum(occ, (1 << 14) - 1)
            perm = np.argsort(
                (seg << 28) | (occ << 14) | gene, kind="stable"
            )
            packed = packed[perm]
        # key hashes are uniform, so top-LUT_BITS prefixes split the sorted
        # table into tiny buckets: a full 18-step binary search (18 gathers
        # per query) becomes 2 LUT gathers + lut_steps (~3) in-bucket steps
        prefixes = index.kmer_keys >> np.uint32(32 - LUT_BITS)
        lut = np.searchsorted(
            prefixes, np.arange((1 << LUT_BITS) + 1, dtype=np.uint32)
        ).astype(np.int32)
        widest = int((lut[1:] - lut[:-1]).max()) if len(index.kmer_keys) else 1
        return cls(
            keys=jnp.asarray(index.kmer_keys),
            start=jnp.asarray(index.kmer_start),
            packed=jnp.asarray(packed),
            lut=jnp.asarray(lut),
            lut_steps=max(1, int(np.ceil(np.log2(widest + 1)))),
            max_post=int(lens.max()) if len(lens) else 1,
            k=index.kmer,
            n_genes=int(index.backbone.shape[0]),  # incl. pseudo-refs
            max_diag=Lmax // DIAG_BUCKET + 4,
        )


def _packKmers(codes: jax.Array, k: int, stride: int):
    """codes [R, L] -> hashes [R, S] uint32, offsets [S], valid [R, S].

    Built from k strided slices (no gather: constant-index gathers still
    lower to per-element gathers on TPU, ~100M elem/s)."""
    R, L = codes.shape
    h = k // 2
    n_pos = (L - k) // stride + 1
    offsets = jnp.arange(n_pos) * stride                       # [S]
    span = (n_pos - 1) * stride + 1
    hi = jnp.zeros((R, n_pos), jnp.uint32)
    lo = jnp.zeros((R, n_pos), jnp.uint32)
    valid = jnp.ones((R, n_pos), bool)
    for i in range(k):
        col = jax.lax.slice(codes, (0, i), (R, i + span), (1, stride))
        valid &= col < 4
        c = col.astype(jnp.uint32)
        if i < h:
            hi = hi + (c << jnp.uint32(2 * (h - 1 - i)))
        else:
            lo = lo + (c << jnp.uint32(2 * (k - 1 - i)))
    keys = (hi * jnp.uint32(KMER_MIX1)) ^ (lo * jnp.uint32(KMER_MIX2))
    return keys, offsets, valid


@partial(
    jax.jit,
    static_argnames=(
        "k", "stride", "max_postings", "top_c", "n_genes", "max_diag",
        "min_votes", "lut_steps",
    ),
)
def _findCandidates(
    codes: jax.Array,
    table_keys: jax.Array,
    table_start: jax.Array,
    table_packed: jax.Array,
    table_lut: jax.Array,
    k: int,
    stride: int,
    max_postings: int,
    top_c: int,
    n_genes: int,
    max_diag: int,
    min_votes: int,
    lut_steps: int,
) -> tuple[jax.Array, jax.Array]:
    """-> cand_key [R, top_c] int32 (gene*max_diag + diag_bucket, -1 = none),
    cand_votes [R, top_c] int32."""
    keys, offsets, valid = _packKmers(codes, k, stride)        # [R, S]
    R, S = keys.shape

    # prefix-LUT lower_bound: 2 LUT gathers + lut_steps in-bucket steps
    # instead of an 18-step binary search over the whole table
    U = table_keys.shape[0]
    pre = (keys >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    lo = table_lut[pre]
    hi = table_lut[pre + 1]
    for _ in range(lut_steps):
        mid = (lo + hi) >> 1
        mv = table_keys[jnp.clip(mid, 0, U - 1)]
        go_right = (mv < keys) & (mid < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | (mid >= hi), hi, mid)
    idx = jnp.clip(lo, 0, U - 1)
    hit = valid & (table_keys[idx] == keys) & (lo < U)

    p_start = table_start[idx]                                 # [R, S]
    p_end = table_start[idx + 1]
    slot = jnp.arange(max_postings)
    p_idx = p_start[:, :, None] + slot[None, None, :]          # [R, S, P]
    p_ok = hit[:, :, None] & (p_idx < p_end[:, :, None])
    p_idx = jnp.clip(p_idx, 0, table_packed.shape[0] - 1)
    packed = table_packed[p_idx]
    gene = (packed >> POS_BITS).astype(jnp.int32)
    pos = (packed & ((1 << POS_BITS) - 1)).astype(jnp.int32)

    diag = jnp.maximum(pos - offsets[None, :, None], 0)
    vote = gene * max_diag + diag // DIAG_BUCKET
    SENTINEL = n_genes * max_diag + 1
    vote = jnp.where(p_ok, vote, SENTINEL).reshape(R, S * max_postings)

    # run-length count per distinct key without searchsorted: sort, mark
    # run starts, and take (next run-start index - own index) via a
    # right-to-left min scan — two cheap scans instead of vmapped binary
    # searches (which compile pathologically on some TPU backends)
    M = vote.shape[1]
    vote_sorted = jnp.sort(vote, axis=1)
    is_run_start = jnp.concatenate(
        [
            jnp.ones((R, 1), dtype=bool),
            vote_sorted[:, 1:] != vote_sorted[:, :-1],
        ],
        axis=1,
    )
    idx = jnp.broadcast_to(jnp.arange(M), (R, M))
    start_or_inf = jnp.where(is_run_start, idx, M)
    # suffix-min (next run start after each position) via log-step
    # doubling shifts — associative_scan compiles pathologically on some
    # TPU backends at this width
    next_start = jnp.concatenate(
        [start_or_inf[:, 1:], jnp.full((R, 1), M)], axis=1
    )
    s = 1
    while s < M:
        shifted = jnp.concatenate(
            [next_start[:, s:], jnp.full((R, s), M)], axis=1
        )
        next_start = jnp.minimum(next_start, shifted)
        s *= 2
    counts = jnp.where(is_run_start, next_start - idx, 0)
    counts = jnp.where(
        (vote_sorted != SENTINEL) & (counts >= min_votes), counts, 0
    )
    top_votes, top_idx = jax.lax.top_k(counts, top_c)
    cand = jnp.take_along_axis(vote_sorted, top_idx, axis=1)
    cand = jnp.where(top_votes > 0, cand, -1)
    return cand.astype(jnp.int32), top_votes.astype(jnp.int32)


def findCandidates(
    table: SeedTable,
    codes: np.ndarray,
    stride: int = 8,
    max_postings: int = 64,
    top_c: int = 4,
    min_votes: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (gene, diag-bucket) keys per read. key // max_diag = gene,
    (key % max_diag) * DIAG_BUCKET = window diagonal estimate."""
    cand, votes = _findCandidates(
        jnp.asarray(codes),
        table.keys,
        table.start,
        table.packed,
        table.lut,
        table.k,
        stride,
        max_postings,
        top_c,
        table.n_genes,
        table.max_diag,
        min_votes,
        table.lut_steps,
    )
    return np.asarray(cand), np.asarray(votes)
