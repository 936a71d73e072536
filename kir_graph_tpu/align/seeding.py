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
    """Device-resident k-mer table + geometry constants."""

    bkeys: jax.Array      # [2^LUT_BITS, ceil(W/2)+1] uint32: each prefix
    #                       bucket's keys as ONE row, two 16-bit key-low-
    #                       halves per u32 (bucket members share the top
    #                       LUT_BITS bits; last entry = bucket count) —
    #                       key lookup is a single half-width row gather
    #                       + in-register compare, no binary search
    padded: jax.Array     # [U, Pmax+1] uint32 posting rows
    #                       (gene<<POS_BITS|pos; last entry = list length),
    #                       fixed-width so the posting lookup is one
    #                       contiguous row gather
    lut: jax.Array        # [2^LUT_BITS + 1] int32 prefix bucket starts
    max_post: int         # Pmax == longest posting list (zero truncation)
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
        # table into tiny buckets; store each bucket's keys as one row so
        # a query is a single row gather + in-register compare (the 18-step
        # binary search was ~7 per-element gathers per k-mer)
        prefixes = index.kmer_keys >> np.uint32(32 - LUT_BITS)
        lut = np.searchsorted(
            prefixes, np.arange((1 << LUT_BITS) + 1, dtype=np.uint32)
        ).astype(np.int32)
        widest = int((lut[1:] - lut[:-1]).max()) if len(index.kmer_keys) else 1
        U = len(index.kmer_keys)
        W = max(widest, 1)
        # keys within a bucket share the top LUT_BITS bits (the bucket
        # index), so their low 32-LUT_BITS bits are fully distinguishing
        # — store only the low 16 (LUT_BITS >= 16), TWO keys per u32.
        # Halves the bucket-row gather, the hottest per-element gather in
        # the seed stage.
        assert LUT_BITS >= 16
        Wp = -(-W // 2)
        bkeys = np.zeros(((1 << LUT_BITS), Wp + 1), dtype=np.uint32)
        if U:
            slots = np.arange(U, dtype=np.int64) - lut[prefixes]
            low16 = (index.kmer_keys & np.uint32(0xFFFF)).astype(np.uint32)
            np.bitwise_or.at(
                bkeys,
                (prefixes.astype(np.int64), slots >> 1),
                low16 << ((slots & 1) * 16).astype(np.uint32),
            )
        bkeys[:, Wp] = (lut[1:] - lut[:-1]).astype(np.uint32)

        # pad every posting list to one fixed-width row (32-entry ceiling:
        # the round-robin gene order above means anything truncated beyond
        # ~2x the gene count is a same-gene repeat, not a lost gene); the
        # row's last entry carries the true list length
        Pmax = int(min(max(int(lens.max()) if len(lens) else 1, 1), 32))
        start = index.kmer_start.astype(np.int64)
        col = np.arange(Pmax)
        rows_idx = np.minimum(start[:-1, None] + col, max(len(packed) - 1, 0))
        padded_rows = packed[rows_idx] if len(packed) else np.zeros(
            (U, Pmax), np.uint32
        )
        padded_rows = np.where(col < lens[:, None], padded_rows, 0).astype(
            np.uint32
        )
        padded_rows = np.concatenate(
            [padded_rows, np.minimum(lens, Pmax).astype(np.uint32)[:, None]],
            axis=1,
        )
        return cls(
            bkeys=jnp.asarray(bkeys),
            padded=jnp.asarray(padded_rows),
            lut=jnp.asarray(lut),
            max_post=Pmax,
            k=index.kmer,
            n_genes=int(index.backbone.shape[0]),  # incl. pseudo-refs
            max_diag=Lmax // DIAG_BUCKET + 4,
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
        "k", "stride", "max_postings", "top_c", "n_genes", "max_diag",
        "min_votes",
    ),
)
def _findCandidates(
    codes: jax.Array,
    lens: jax.Array,
    table_bkeys: jax.Array,
    table_padded: jax.Array,
    table_lut: jax.Array,
    k: int,
    stride: int,
    max_postings: int,
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
    seeded (and downstream scored) stream count vs seeding fwd+rc."""
    keys, offsets, valid, qflip = _packKmers(codes, k, stride)  # [R, S]
    R, S = keys.shape

    # bucketed key rows: the whole lookup is one row gather + in-register
    # compare (slots >= the bucket's count are masked, so junk fill can
    # never shadow a real key), plus one per-element lut gather for the
    # bucket's global start.  Rows carry two 16-bit key-low-halves per
    # u32 (bucket members share the top LUT_BITS bits, so the low 16 are
    # fully distinguishing) — half the gathered elements.
    U = table_padded.shape[0]
    Wp = table_bkeys.shape[1] - 1
    pre = (keys >> jnp.uint32(32 - LUT_BITS)).astype(jnp.int32)
    brow = jnp.take(table_bkeys, pre, axis=0)                  # [R, S, Wp+1]
    cnt = brow[:, :, Wp].astype(jnp.int32)
    pairs = brow[:, :, :Wp]
    halves = jnp.stack(
        [pairs & jnp.uint32(0xFFFF), pairs >> jnp.uint32(16)], axis=-1
    ).reshape(*pairs.shape[:-1], 2 * Wp)                       # slot order
    key16 = (keys & jnp.uint32(0xFFFF))[:, :, None]
    m = (halves == key16) & (
        jnp.arange(2 * Wp)[None, None, :] < cnt[:, :, None]
    )
    hit = valid & m.any(axis=-1)
    off = jnp.argmax(m, axis=-1).astype(jnp.int32)
    idx = jnp.clip(table_lut[pre] + off, 0, max(U - 1, 0))

    # fixed-width posting rows (last entry = true length): one contiguous
    # row gather, then slice the (static) cap — no per-element gather
    # anywhere in the posting lookup
    Pmax = table_padded.shape[1] - 1
    P = min(max_postings, Pmax)
    rows = jnp.take(table_padded, idx, axis=0)                 # [R, S, Pmax+1]
    packed = rows[:, :, :P]
    p_len = rows[:, :, Pmax].astype(jnp.int32)
    slot = jnp.arange(P)
    p_ok = hit[:, :, None] & (slot[None, None, :] < p_len[:, :, None])
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
    vote = jnp.where(p_ok, vote, SENTINEL).reshape(R, S * P)

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
    stride: int = 8,
    max_postings: int = 64,
    top_c: int = 4,
    min_votes: int = 2,
) -> tuple[np.ndarray, np.ndarray]:
    """Candidate (gene, orient, diag-bucket) keys per FORWARD-strand read.
    key // (2*max_diag) = gene, (key // max_diag) % 2 = orientation
    (1 = read aligns reverse-complemented), (key % max_diag) * DIAG_BUCKET
    = window diagonal estimate."""
    if lens is None:
        lens = np.full(len(codes), codes.shape[1], np.int32)
    cand, votes = _findCandidates(
        jnp.asarray(codes),
        jnp.asarray(lens.astype(np.int32)),
        table.bkeys,
        table.padded,
        table.lut,
        table.k,
        stride,
        max_postings,
        top_c,
        table.n_genes,
        table.max_diag,
        min_votes,
    )
    return np.asarray(cand), np.asarray(votes)
