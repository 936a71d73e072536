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


POS_BITS = 17   # posting = gene << (POS_BITS+1) | flip << POS_BITS | pos
#                 (one gather carries gene, canonical-flip and position)
LUT_BITS = 18   # key-prefix LUT: top bits -> bucket range in the sorted keys


@dataclass
class SeedTable:
    """Device-resident k-mer table + geometry constants.

    ONE-GATHER layout: `merged[prefix]` is the whole prefix bucket —
    per-posting 16-bit key tags (two per u32), the postings, and the
    bucket's posting count — indexed DIRECTLY by a query k-mer's top
    LUT_BITS hash bits.  A seed lookup is therefore a single contiguous
    row gather + in-register tag compare.  The previous layout took
    three gathers per (read, window): a bucket-key row, a per-element
    LUT start, and a posting row; row gathers cost per ROW on TPU
    (docs/ROOFLINE.md), so collapsing three into one is the seed
    stage's formulation-level floor.
    """

    merged: jax.Array     # [2^LUT_BITS, Wt + Wc + 1] uint32 where
    #                       Wc = widest bucket's posting total and
    #                       Wt = ceil(Wc/2):
    #                       [:Wt]        key low-16 tags, 2 per u32,
    #                                    one per POSTING slot
    #                       [Wt:Wt+Wc]   postings
    #                                    gene<<(POS_BITS+1)|flip<<POS_BITS|pos
    #                       [Wt+Wc]      bucket posting count
    bucket_width: int     # Wc
    max_post: int         # per-key posting cap applied at build
    k: int
    n_genes: int
    max_diag: int

    @classmethod
    def fromIndex(cls, index) -> "SeedTable":
        Lmax = int(index.backbone.shape[1])
        assert Lmax < (1 << POS_BITS)
        assert index.backbone.shape[0] < (1 << (31 - POS_BITS))
        packed = (
            (index.kmer_gene.astype(np.uint32) << np.uint32(POS_BITS + 1))
            | (index.kmer_flip.astype(np.uint32) << np.uint32(POS_BITS))
            | index.kmer_pos.astype(np.uint32)
        )

        # reorder each key's posting list round-robin over genes, so the
        # per-key cap below drops same-gene repeats before it ever drops
        # a gene's only placement
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

        # per-key cap (32-entry ceiling: beyond ~2x the gene count the
        # round-robin order means truncation drops same-gene repeats,
        # not a gene's only placement)
        U = len(index.kmer_keys)
        Pmax = int(min(max(int(lens.max()) if len(lens) else 1, 1), 32))
        assert LUT_BITS >= 16  # low-16 tags must distinguish in-bucket
        B = 1 << LUT_BITS
        prefixes = (index.kmer_keys >> np.uint32(32 - LUT_BITS)).astype(
            np.int64
        )
        lens_c = np.minimum(lens, Pmax).astype(np.int64)
        tot = np.zeros(B, np.int64)
        if U:
            np.add.at(tot, prefixes, lens_c)
        Wc = max(int(tot.max()) if U else 1, 1)
        Wt = -(-Wc // 2)
        merged = np.zeros((B, Wt + Wc + 1), np.uint32)
        if U:
            # flat (key, occurrence) entries of every capped posting list
            key_idx = np.repeat(np.arange(U, dtype=np.int64), lens_c)
            ends = np.cumsum(lens_c)
            occ = np.arange(len(key_idx), dtype=np.int64) - np.repeat(
                ends - lens_c, lens_c
            )
            post_vals = packed[index.kmer_start[:-1].astype(np.int64)[key_idx] + occ]
            # slot order within a bucket: KEY-major, so one query's
            # matching postings occupy a CONTIGUOUS run (kept for layout
            # clarity; a barrel-shift compaction exploiting it measured
            # slower than sorting the full bucket width — BENCH_NOTES r4)
            order = np.lexsort((occ, key_idx, prefixes[key_idx]))
            bucket = prefixes[key_idx][order]
            slot = np.arange(len(order), dtype=np.int64) - np.r_[
                0, np.cumsum(tot)
            ][bucket]
            tag = (index.kmer_keys[key_idx][order] & np.uint32(0xFFFF)).astype(
                np.uint32
            )
            np.bitwise_or.at(
                merged,
                (bucket, slot >> 1),
                tag << ((slot & 1) * 16).astype(np.uint32),
            )
            merged[bucket, Wt + slot] = post_vals[order]
        merged[:, Wt + Wc] = tot.astype(np.uint32)
        return cls(
            merged=jnp.asarray(merged),
            bucket_width=Wc,
            max_post=Pmax,
            k=index.kmer,
            n_genes=int(index.backbone.shape[0]),  # incl. pseudo-refs
            max_diag=Lmax // DIAG_BUCKET + 4,
        )


# pytree: `merged` is the (big) device leaf, the geometry ints are
# static metadata — lets a SeedTable ride as a jit ARGUMENT instead of
# being closed over (closure capture embeds the table as an MLIR
# constant, which every compile re-fetches through the device link)
jax.tree_util.register_dataclass(
    SeedTable,
    data_fields=["merged"],
    meta_fields=["bucket_width", "max_post", "k", "n_genes", "max_diag"],
)


def _packKmers(codes: jax.Array, k: int, stride: int):
    """codes [R, L] -> (canonical hashes [R, S] uint32, offsets [S],
    valid [R, S], flip [R, S]).

    Canonical = min(kmer, revcomp(kmer)) as a 2k-bit value; flip marks
    windows whose canonical form is the revcomp (same convention as
    index/build.py:canonHashKmerWindows — the uint32 arithmetic must
    match bit-for-bit).  Both strands accumulate from the same k strided
    slices (no gather: constant-index gathers still lower to per-element
    gathers on TPU, ~100M elem/s)."""
    R, L = codes.shape
    h = k // 2
    n_pos = (L - k) // stride + 1
    offsets = jnp.arange(n_pos) * stride                       # [S]
    span = (n_pos - 1) * stride + 1
    fhi = jnp.zeros((R, n_pos), jnp.uint32)
    flo = jnp.zeros((R, n_pos), jnp.uint32)
    rhi = jnp.zeros((R, n_pos), jnp.uint32)
    rlo = jnp.zeros((R, n_pos), jnp.uint32)
    valid = jnp.ones((R, n_pos), bool)
    for i in range(k):
        col = jax.lax.slice(codes, (0, i), (R, i + span), (1, stride))
        valid &= col < 4
        c = col.astype(jnp.uint32)
        comp = jnp.uint32(3) - (c & jnp.uint32(3))  # pad-safe complement
        # forward halves: base i sits at weight 2*(k-1-i)
        if i < h:
            fhi = fhi + (c << jnp.uint32(2 * (h - 1 - i)))
        else:
            flo = flo + (c << jnp.uint32(2 * (k - 1 - i)))
        # revcomp halves: base i lands at rc position k-1-i
        if i >= h:
            rhi = rhi + (comp << jnp.uint32(2 * (i - h)))
        else:
            rlo = rlo + (comp << jnp.uint32(2 * i))
    flip = (rhi < fhi) | ((rhi == fhi) & (rlo < flo))
    chi = jnp.where(flip, rhi, fhi)
    clo = jnp.where(flip, rlo, flo)
    keys = (chi * jnp.uint32(KMER_MIX1)) ^ (clo * jnp.uint32(KMER_MIX2))
    return keys, offsets, valid, flip


@partial(
    jax.jit,
    static_argnames=(
        "k", "stride", "top_c", "n_genes", "max_diag", "min_votes",
    ),
)
def _findCandidates(
    codes: jax.Array,
    lens: jax.Array,
    table_merged: jax.Array,
    k: int,
    stride: int,
    top_c: int,
    n_genes: int,
    max_diag: int,
    min_votes: int,
) -> tuple[jax.Array, jax.Array]:
    """-> cand_key [R, top_c] int32, cand_votes [R, top_c] int32.

    Seeds only the FORWARD strand: k-mers are canonical, and each hit's
    orientation is query_flip ^ posting_flip, folded into the key:
    cand_key = (gene*2 + orient)*max_diag + diag_bucket (-1 = none),
    orient 1 = the read aligns reverse-complemented.  This halves the
    seeded (and downstream scored) stream count vs seeding fwd+rc.

    The whole table lookup is ONE row gather: `merged[key >> (32-LUT)]`
    carries the bucket's per-posting key tags, postings and count; a
    posting belongs to the queried k-mer iff its tag equals the key's
    low 16 bits (bucket members share the top LUT_BITS bits, so low-16
    is fully distinguishing).  Row gathers cost per row on this
    hardware (docs/ROOFLINE.md), so one wider row beats the previous
    bucket-keys row + LUT element + posting row triple.
    """
    keys, offsets, valid, qflip = _packKmers(codes, k, stride)  # [R, S]
    R, S = keys.shape

    Wrow = table_merged.shape[1]
    Wc = (2 * (Wrow - 1)) // 3          # Wrow = ceil(Wc/2) + Wc + 1
    Wt = Wrow - 1 - Wc
    pre = (keys >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    row = jnp.take(table_merged, pre, axis=0)                  # [R, S, Wrow]
    tag_pairs = row[:, :, :Wt]
    tags = jnp.stack(
        [tag_pairs & jnp.uint32(0xFFFF), tag_pairs >> jnp.uint32(16)],
        axis=-1,
    ).reshape(R, S, 2 * Wt)[:, :, :Wc]                          # slot order
    packed = row[:, :, Wt:Wt + Wc]
    cnt = row[:, :, Wrow - 1].astype(jnp.int32)
    key16 = (keys & jnp.uint32(0xFFFF))[:, :, None]
    slot = jnp.arange(Wc)
    p_ok = (
        valid[:, :, None]
        & (tags == key16)
        & (slot[None, None, :] < cnt[:, :, None])
    )
    gene = (packed >> (POS_BITS + 1)).astype(jnp.int32)
    pflip = ((packed >> POS_BITS) & 1).astype(jnp.int32)
    pos = (packed & ((1 << POS_BITS) - 1)).astype(jnp.int32)

    # hit orientation + per-orientation diagonal: a fwd-strand k-mer at
    # read offset t sits at rc-read offset len - k - t
    orient = pflip ^ qflip.astype(jnp.int32)[:, :, None]       # [R, S, P]
    off_fwd = offsets[None, :, None]
    off_rc = lens[:, None, None] - k - off_fwd
    diag = jnp.maximum(
        pos - jnp.where(orient == 1, off_rc, off_fwd), 0
    )
    vote = (gene * 2 + orient) * max_diag + diag // DIAG_BUCKET
    SENTINEL = n_genes * 2 * max_diag + 1
    vote = jnp.where(p_ok, vote, SENTINEL).reshape(R, S * Wc)
    # (a barrel-shift compaction of each query's contiguous match run
    # down to max_post slots before the sort was measured SLOWER on TPU
    # than sorting the full S*Wc width — docs/BENCH_NOTES.md round 4)

    # run-length count per distinct key without searchsorted: sort, mark
    # run starts, and take (next run-start index - own index) via a
    # right-to-left min scan — two cheap scans instead of vmapped binary
    # searches (which compile pathologically on some TPU backends)
    M = vote.shape[1]
    # the sort + the doubling scan below are memory-bound: use 16-bit
    # keys/positions when the static ranges allow (they do for every
    # real KIR index: 17 genes x 2 x ~1k diag buckets < 2^16), halving
    # the bandwidth of the seed stage's hottest ops
    key_dt = jnp.uint16 if SENTINEL < 65535 else jnp.int32
    pos_dt = jnp.int16 if M < 32767 else jnp.int32
    vote = vote.astype(key_dt)
    vote_sorted = jnp.sort(vote, axis=1)
    is_run_start = jnp.concatenate(
        [
            jnp.ones((R, 1), dtype=bool),
            vote_sorted[:, 1:] != vote_sorted[:, :-1],
        ],
        axis=1,
    )
    idx = jnp.broadcast_to(jnp.arange(M, dtype=pos_dt), (R, M))
    start_or_inf = jnp.where(is_run_start, idx, pos_dt(M))
    # suffix-min (next run start after each position) via log-step
    # doubling shifts — associative_scan compiles pathologically on some
    # TPU backends at this width
    next_start = jnp.concatenate(
        [start_or_inf[:, 1:], jnp.full((R, 1), M, dtype=pos_dt)], axis=1
    )
    s = 1
    while s < M:
        shifted = jnp.concatenate(
            [next_start[:, s:], jnp.full((R, s), M, dtype=pos_dt)], axis=1
        )
        next_start = jnp.minimum(next_start, shifted)
        s *= 2
    counts = jnp.where(is_run_start, next_start - idx, pos_dt(0))
    counts = jnp.where(
        (vote_sorted != key_dt(SENTINEL)) & (counts >= min_votes),
        counts, pos_dt(0),
    ).astype(jnp.int32)
    top_votes, top_idx = jax.lax.top_k(counts, top_c)
    cand = jnp.take_along_axis(vote_sorted, top_idx, axis=1).astype(jnp.int32)
    cand = jnp.where(top_votes > 0, cand, -1)
    return cand, top_votes.astype(jnp.int32)


def findCandidates(
    table: SeedTable,
    codes: np.ndarray,
    lens: np.ndarray | None = None,
    stride: int = 12,
    top_c: int = 4,
    min_votes: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (gene, orient, diag-bucket) keys per FORWARD-strand read.
    key // (2*max_diag) = gene, (key // max_diag) % 2 = orientation
    (1 = read aligns reverse-complemented), (key % max_diag) * DIAG_BUCKET
    = window diagonal estimate.  (Posting caps are baked into the table
    at build time — SeedTable.fromIndex's per-key 32-entry ceiling.)"""
    if lens is None:
        lens = np.full(len(codes), codes.shape[1], np.int32)
    cand, votes = _findCandidates(
        jnp.asarray(codes),
        jnp.asarray(lens.astype(np.int32)),
        table.merged,
        table.k,
        stride,
        top_c,
        table.n_genes,
        table.max_diag,
        min_votes,
    )
    return np.asarray(cand), np.asarray(votes)
