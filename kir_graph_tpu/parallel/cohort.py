"""
Pure-device cohort step: the whole per-batch compute path as one jitted,
shardable program (no host round-trips).

This is the scale-out fast path: seeding -> candidate DP scoring ->
concordant pairing -> approximate depth (interval scatter) -> pooled CN
histogram -> SNP-evidence typing likelihoods, with

* reads sharded over the ``data`` mesh axis,
* the variant x allele membership matmul sharded over ``model``,
* depth / histogram / likelihood reductions psum'd across ``data``.

The exact host path (align/pipeline.py + align/annotate.py) remains the
source of final calls — this device path powers throughput benchmarking,
cohort CN, and the multi-chip dry-run.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..align.dp import AlignParams, bandedScore
from ..align.seeding import DIAG_BUCKET, SeedTable, _findCandidates
from ..index.build import BASE_PAD, KirIndex
from ..typing.kernels import LOG_HIT, LOG_MISS

PAD_L = 64


@dataclass
class DeviceIndexArrays:
    """Replicated (per-chip) index arrays for the pure-device path."""

    backbone: jax.Array     # [G, Lpad] int8
    altdel: jax.Array       # [G, Lpad] uint8 (bits 0-3 alts, bit 4 del_ok)
    win: jax.Array          # [G*max_diag, W] uint8 precomputed bucket windows
    #                         (packWindowBytes layout; row = gene*max_diag+diag,
    #                         i.e. exactly the seed candidate key — per-element
    #                         window gathers become contiguous row gathers)
    lengths: jax.Array      # [G] int32
    table: SeedTable
    # dense variant tables (padded to Vmax): SNP-only typing evidence
    var_gene: jax.Array     # [Vmax] int32
    var_pos: jax.Array      # [Vmax] int32
    var_alt: jax.Array      # [Vmax] int32 (snp alt code; -1 for deletion/pad)
    membership: jax.Array   # [Vmax, Amax] f32
    # pseudo-reference remap (rows >= n_true are spliced long-deletion
    # references; a placement there is the parent placement with columns
    # >= remap_pos shifted by +remap_shift — KirIndex docstring)
    remap_gene: jax.Array   # [G] int32 (parent row; identity for true rows)
    remap_pos: jax.Array    # [G] int32 (splice column; huge for true rows)
    remap_shift: jax.Array  # [G] int32 (excised deletion length; 0 for true)
    n_genes: int
    n_true: int
    Lmax: int
    params: AlignParams


# pytree: array fields are device leaves, geometry/params are static
# metadata (AlignParams is frozen, so hashable) — an arr can then be a
# jit ARGUMENT; closure capture would embed every table as an MLIR
# constant re-fetched through the device link on each compile
jax.tree_util.register_dataclass(
    DeviceIndexArrays,
    data_fields=[
        "backbone", "altdel", "win", "lengths", "table",
        "var_gene", "var_pos", "var_alt", "membership",
        "remap_gene", "remap_pos", "remap_shift",
    ],
    meta_fields=["n_genes", "n_true", "Lmax", "params"],
)


def buildDeviceArrays(index: KirIndex, params: AlignParams | None = None) -> DeviceIndexArrays:
    p = params or AlignParams()
    G, Lmax = index.backbone.shape
    max_diag = Lmax // DIAG_BUCKET + 4  # == SeedTable.max_diag
    pad_total = PAD_L + (max_diag - 1) * DIAG_BUCKET - DIAG_BUCKET + p.window + 8
    backbone = np.full((G, pad_total), BASE_PAD, dtype=np.int8)
    backbone[:, PAD_L : PAD_L + Lmax] = index.backbone
    altdel = np.zeros((G, pad_total), dtype=np.uint8)
    altdel[:, PAD_L : PAD_L + Lmax] = index.alt_mask | (
        index.del_ok.astype(np.uint8) << 4
    )

    # one packed byte plane (bits 0-3 alts, bit 4 del, bits 5-7 base),
    # pre-sliced into the seed diagonal buckets: row gene*max_diag + diag
    # holds the window starting at column diag*DIAG_BUCKET - DIAG_BUCKET
    plane = (backbone.astype(np.uint8) << 5) | altdel
    sw = np.lib.stride_tricks.sliding_window_view(plane, p.window, axis=1)
    starts = PAD_L - DIAG_BUCKET + np.arange(max_diag) * DIAG_BUCKET
    win = np.ascontiguousarray(sw[:, starts, :]).reshape(G * max_diag, p.window)

    # flatten variants across genes, pad allele axis to the global max
    # (floors keep the tables non-degenerate for variant-free linear
    # indexes, e.g. the WGS extraction regions)
    Amax = max(1, max(len(g.alleles) for g in index.genes.values()))
    var_gene, var_pos, var_alt, membership = [], [], [], []
    for gi, name in enumerate(index.gene_names):
        g = index.genes[name]
        for vi in range(len(g.variants)):
            var_gene.append(gi)
            var_pos.append(int(g.var_pos[vi]))
            var_alt.append(-1 if g.var_is_del[vi] else int(g.var_val[vi]))
            row = np.zeros(Amax, dtype=np.float32)
            row[: g.membership.shape[1]] = g.membership[vi]
            membership.append(row)
    Vmax = max(128, -(-len(var_gene) // 128) * 128)
    pad = Vmax - len(var_gene)
    var_gene += [0] * pad
    var_pos += [0] * pad
    var_alt += [-1] * pad
    membership += [np.zeros(Amax, dtype=np.float32)] * pad

    n_true = index.n_true_genes
    remap_gene = np.arange(G, dtype=np.int32)
    remap_pos = np.full(G, 1 << 28, dtype=np.int32)
    remap_shift = np.zeros(G, dtype=np.int32)
    for pi, (tgi, dpos, dlen) in enumerate(index.pseudo_refs):
        remap_gene[n_true + pi] = tgi
        remap_pos[n_true + pi] = dpos
        remap_shift[n_true + pi] = dlen

    return DeviceIndexArrays(
        backbone=jnp.asarray(backbone),
        altdel=jnp.asarray(altdel),
        win=jnp.asarray(win),
        lengths=jnp.asarray(index.lengths),
        table=SeedTable.fromIndex(index),
        var_gene=jnp.asarray(np.array(var_gene, dtype=np.int32)),
        var_pos=jnp.asarray(np.array(var_pos, dtype=np.int32)),
        var_alt=jnp.asarray(np.array(var_alt, dtype=np.int32)),
        membership=jnp.asarray(np.stack(membership)),
        remap_gene=jnp.asarray(remap_gene),
        remap_pos=jnp.asarray(remap_pos),
        remap_shift=jnp.asarray(remap_shift),
        n_genes=G,
        n_true=n_true,
        Lmax=Lmax,
        params=p,
    )


def unpackCodes2bit(packed: jax.Array, L: int) -> jax.Array:
    """[N, ceil(L/4)] uint8 -> [N, L] int8 (inverse of encode.packCodes2bit)."""
    j = jnp.arange(L)
    byte = packed[:, j // 4]
    shift = (2 * (j % 4)).astype(jnp.uint8)
    return ((byte >> shift) & 3).astype(jnp.int8)


def unpackCodes4bit(packed: jax.Array, L: int) -> jax.Array:
    """[N, ceil(L/2)] uint8 -> [N, L] int8 (inverse of
    encode.packCodes4bit; keeps N/pad code 4 intact)."""
    j = jnp.arange(L)
    byte = packed[:, j // 2]
    shift = (4 * (j % 2)).astype(jnp.uint8)
    return ((byte >> shift) & 15).astype(jnp.int8)


def revCompDevice(
    codes: jax.Array, lengths: jax.Array, uniform_len: int | None = None
) -> jax.Array:
    """Device-side reverse complement of padded code rows.

    The per-row re-alignment (a read of length l reversed inside an
    L-wide row must shift left by L-l) is a take_along_axis — an
    element gather that runs at ~90 Melem/s on TPU, ~100 ms per 32k-pair
    chunk (docs/ROOFLINE.md).  When the caller knows every real row
    shares one length (the overwhelmingly common Illumina case), pass it
    as static ``uniform_len``: the shift becomes one static slice and
    the whole revcomp is elementwise.  Rows of a different length must
    then be all-PAD (code 4: complement is 4, so any rotation is a
    no-op) — the aligner's bucket padding satisfies this; reads shorter
    than the seed k can't vote and stay unmapped regardless."""
    N, L = codes.shape
    rev = codes[:, ::-1]
    flipped = jnp.where(rev < 4, 3 - rev, 4).astype(jnp.int8)
    col = jnp.arange(L)[None, :]
    if uniform_len is not None and 0 < uniform_len <= L:
        s = L - int(uniform_len)
        gathered = (
            flipped
            if s == 0
            else jnp.concatenate([flipped[:, s:], flipped[:, :s]], axis=1)
        )
    else:
        shift = (L - lengths)[:, None]
        gathered = jnp.take_along_axis(
            flipped, jnp.minimum(shift + col, L - 1), axis=1
        )
    return jnp.where(col < lengths[:, None], gathered, 4).astype(jnp.int8)


def _candidatesFor(arr: DeviceIndexArrays, codes, lens, top_c, stride,
                   min_votes):
    return _findCandidates(
        codes,
        lens,
        arr.table.merged,
        arr.table.k,
        stride,
        top_c,
        arr.table.n_genes,
        arr.table.max_diag,
        min_votes,
    )


def decodeCandidates(cand, md: int):
    """Orientation-folded candidate keys -> (gene row, orient, diag).
    gene = -1 marks empty slots (orient meaningless there)."""
    gene_o = cand // md
    gene = jnp.where(cand >= 0, gene_o >> 1, -1)
    orient = jnp.where(cand >= 0, gene_o & 1, 0)
    return gene, orient, cand % md


def scoreDenseGrid(win, md: int, p: AlignParams, codes, lens, gene, diag,
                   orient=None, use_pallas: bool = False,
                   want_lin: bool = True):
    """DP-score a dense [R, C] candidate grid -> (cost [R, C], end [R, C],
    lin [R, C]), lin being the pure-diagonal cost at each candidate's
    winning end offset (the aligner's ungapped-shortcut decision).

    Windows come from the precomputed per-(gene, diag-bucket) byte-plane
    table: one contiguous row gather instead of [J, W] per-element gathers
    (the latter run at ~100M elem/s on TPU — 10x slower than the DP kernel
    itself at bench shapes).

    Candidate read rows, one of:
    * `orient` [R, C] (the canonical-seeding path): `codes` is the
      4-stream pool [m1f, m1rc, m2f, m2rc] and each candidate's row is
      fully determined by its grid position plus this orientation bit —
      so the rows are built from static slices + repeat + an elementwise
      select, NO row gather (row gathers on this hardware cost per ROW,
      docs/ROOFLINE.md; measured equivalent to the gather at bench
      shapes, kept for the simpler dataflow).
    * None: row r of `codes` serves all of row r's candidates.
    """
    R, C = gene.shape
    rows = jnp.where(gene >= 0, gene * md + diag, 0).reshape(-1)
    wbytes = jnp.take(win, rows, axis=0)
    if orient is not None:
        # grid rows are [mate1 pairs | mate2 pairs]; pool rows are
        # (2*mate + orient)*Rp + r_local — slice the pool into its fwd
        # and rc halves in grid-row order, fan each out C-wide (static
        # reshape/broadcast), and pick per candidate by orientation
        Rp = codes.shape[0] // 4
        fwd = jnp.concatenate([codes[:Rp], codes[2 * Rp:3 * Rp]], axis=0)
        rc = jnp.concatenate([codes[Rp:2 * Rp], codes[3 * Rp:]], axis=0)
        rcodes = jnp.where(
            (orient.reshape(-1) == 1)[:, None],
            jnp.repeat(rc, C, axis=0),
            jnp.repeat(fwd, C, axis=0),
        )
    else:
        rcodes = jnp.repeat(codes, C, axis=0)
    rlens = jnp.repeat(lens, C)
    if use_pallas:
        from ..ops.dp_pallas import bandedScorePallasBytes

        cost, end_off, lin = bandedScorePallasBytes(
            wbytes, rcodes, rlens, p, want_lin=want_lin
        )
    else:
        from ..align.dp import bandedScoreBytes

        cost, end_off, lin = bandedScoreBytes(wbytes, rcodes, rlens, p)
    cost = cost.reshape(R, C) + jnp.where(gene < 0, 1e9, 0.0)
    w0 = diag * DIAG_BUCKET - DIAG_BUCKET
    end_abs = w0 + (rlens.reshape(R, C) - 1) + end_off.reshape(R, C)
    return cost, end_abs, lin.reshape(R, C) if lin is not None else None


def cohortStep(
    arr: DeviceIndexArrays,
    codes1: jax.Array,
    len1: jax.Array,
    codes2: jax.Array,
    len2: jax.Array,
    rc1: jax.Array,
    rc2: jax.Array,
    top_c: int = 2,
    stride: int = 12,  # GraphAligner.DEFAULT_STRIDE rationale
    min_votes: int = 2,
    cn_bins: int = 128,
    axis_name: str | None = "data",
    use_pallas: bool = False,
):
    """One sharded cohort step.  Returns (depth [G, Lmax], cn_hist [bins],
    allele_loglik [A]) — all psum'd over `axis_name` when set.

    rc1/rc2 are the precomputed reverse-complements (host-side revcomp keeps
    the device program gather-free).
    """
    md = arr.table.max_diag
    R = codes1.shape[0]

    # --- canonical seeding: only the two FORWARD streams; orientation is
    # folded into each candidate (query_flip ^ posting_flip)
    codes_fwd = jnp.concatenate([codes1, codes2], axis=0)      # [2R, RL]
    lens_fwd = jnp.concatenate([len1, len2]).astype(jnp.int32)
    cand, _ = _candidatesFor(
        arr, codes_fwd, lens_fwd, top_c, stride, min_votes
    )
    gene, orient, diag = decodeCandidates(cand, md)

    # --- ONE dense scoring pass over [2R, C]; each candidate reads its
    # oriented codes row from the 4-stream pool
    codes_all = jnp.concatenate([codes1, rc1, codes2, rc2], axis=0)
    cost, end, _ = scoreDenseGrid(
        arr.win, md, arr.params, codes_all, lens_fwd, gene, diag,
        orient=orient, use_pallas=use_pallas, want_lin=False,
    )

    return _pairAndReduce(
        arr, cost[:R], cost[R:], gene[:R], gene[R:], diag[:R], diag[R:],
        end[:R], end[R:], orient[:R], orient[R:], len1, len2, codes_all,
        axis_name=axis_name, cn_bins=cn_bins,
    )


# ---------------------------------------------------------------------------
# split-stage single-chip driver: three small jitted programs instead of one
# monolith (fast compiles on remote-compile backends, per-stage timing).
# ---------------------------------------------------------------------------

class SplitCohortStep:
    """Eagerly-composed cohort step: seed / score / finalize stages."""

    def __init__(self, arr: DeviceIndexArrays, top_c: int = 2, use_pallas: bool = False):
        self.arr = arr
        self.top_c = top_c
        md = arr.table.max_diag

        # posting caps are baked into the merged table at build time
        # (SeedTable.fromIndex's per-key 32-entry ceiling)
        # arr rides as a jit argument (registered pytree): closure
        # capture would embed the tables as MLIR constants re-fetched
        # over the device link at every compile
        @jax.jit
        def seed(A, codes1, codes2, len1, len2):
            codes = jnp.concatenate([codes1, codes2], axis=0)   # [2R, RL]
            lens = jnp.concatenate([len1, len2]).astype(jnp.int32)
            cand, _ = _candidatesFor(A, codes, lens, top_c, 12, 2)
            gene, orient, diag = decodeCandidates(cand, md)
            return gene, orient, diag

        @jax.jit
        def score(A, codes1, rc1, codes2, rc2, len1, len2, gene, orient, diag):
            codes_all = jnp.concatenate([codes1, rc1, codes2, rc2], axis=0)
            lens = jnp.concatenate([len1, len2]).astype(jnp.int32)
            cost, end, _ = scoreDenseGrid(
                A.win, md, A.params, codes_all, lens, gene,
                diag, orient=orient, use_pallas=use_pallas,
                want_lin=False,
            )
            return cost, end

        @jax.jit
        def finalize(A, cost, gene, orient, diag, end, len1, len2,
                     codes1, rc1, codes2, rc2):
            R = codes1.shape[0]
            codes_all = jnp.concatenate([codes1, rc1, codes2, rc2], axis=0)
            return _pairAndReduce(
                A, cost[:R], cost[R:], gene[:R], gene[R:], diag[:R],
                diag[R:], end[:R], end[R:], orient[:R], orient[R:],
                len1, len2, codes_all, axis_name=None,
            )

        self._seed = seed
        self._score = score
        self._finalize = finalize

    def __call__(self, codes1, len1, codes2, len2, rc1, rc2, timings=None):
        """All four (mate, orientation) streams are stacked into single
        seed/score dispatches — on tunneled TPUs each dispatch costs ~50ms
        RTT, so the whole chunk is 3 device calls.  timings=None runs
        fully async; pass a dict to sync per stage and collect wall times.
        """
        import time as _t

        t0 = _t.time()
        gene, orient, diag = self._seed(self.arr, codes1, codes2, len1, len2)  # [2R, C]
        if timings is not None:
            jax.block_until_ready(gene)
        t1 = _t.time()
        cost, end = self._score(
            self.arr, codes1, rc1, codes2, rc2, len1, len2, gene,
            orient, diag,
        )
        if timings is not None:
            jax.block_until_ready(cost)
        t2 = _t.time()

        out = self._finalize(
            self.arr, cost, gene, orient, diag, end, len1, len2,
            codes1, rc1, codes2, rc2,
        )
        if timings is not None:
            jax.block_until_ready(out)
        t3 = _t.time()
        if timings is not None:
            timings["seed"] = timings.get("seed", 0.0) + (t1 - t0)
            timings["score"] = timings.get("score", 0.0) + (t2 - t1)
            timings["finalize"] = timings.get("finalize", 0.0) + (t3 - t2)
        return out


def _pairAndReduce(
    arr, m1c, m2c, m1g, m2g, m1d, m2d, m1e, m2e, m1o, m2o,
    len1, len2, codes_all, axis_name=None, cn_bins: int = 128,
):
    """FR pairing + base pileup + depth + CN histogram + SNP-evidence
    likelihood.  Inputs are [R, C] per-mate candidate grids with a
    per-candidate orientation (canonical seeding) and codes_all [4R, RL]
    in stream order [m1 fwd, m1 rc, m2 fwd, m2 rc].

    Evidence is accumulated as a (gene, position, base) pileup scatter of
    ~R*RL elements, then read back at the V catalogued SNP positions —
    the likelihood is linear in per-variant counts, so this is exact for
    the summed allele log-likelihood while avoiding the [R, V] gather
    (per-element gathers run ~100M elem/s on TPU; V*R is 30x R*RL here).
    Both mates contribute, in their winning orientation.
    """
    R, C = m1c.shape
    RL = codes_all.shape[1]

    pc = m1c[:, :, None] + m2c[:, None, :]
    ok = (m1g[:, :, None] == m2g[:, None, :]) & (m1g[:, :, None] >= 0)
    ok &= m1o[:, :, None] != m2o[:, None, :]   # FR: opposite orientations
    ok &= jnp.abs(m1d[:, :, None] - m2d[:, None, :]) <= 70
    pair_cost = jnp.where(ok, pc, 1e9).reshape(R, -1)
    best = pair_cost.min(axis=1)
    combo = pair_cost.argmin(axis=1)
    mapped = best < 8.0

    bc1 = combo // C
    bc2 = combo % C
    ridx = jnp.arange(R)
    bo = m1o[ridx, bc1]               # winning mate-1 orientation [R]
    o2 = m2o[ridx, bc2]
    gene_best = jnp.where(mapped, m1g[ridx, bc1], 0)
    # pseudo-reference placements remap to the parent gene: columns past
    # the splice point shift by the excised deletion length, so junction-
    # spanning evidence lands on true coordinates (exact-path parity)
    dpos = arr.remap_pos[gene_best][:, None]
    dlen = arr.remap_shift[gene_best][:, None]
    gene_true = jnp.where(mapped, arr.remap_gene[gene_best], 0)
    end1 = m1e[ridx, bc1]
    end2 = m2e[ridx, bc2]
    start1 = end1 - len1 + 1
    start2 = end2 - len2 + 1

    # mate bases in the orientation that actually aligned
    c1 = codes_all[bo * R + ridx]
    c2 = codes_all[(2 + o2) * R + ridx]

    G, Lp = arr.n_genes, arr.Lmax
    col_j = jnp.arange(RL)[None, :]
    pile = jnp.zeros((G * Lp * 4 + 1,), dtype=jnp.float32)
    for codes, start, lens in ((c1, start1, len1), (c2, start2, len2)):
        cols = start[:, None] + col_j
        cols = cols + jnp.where(cols >= dpos, dlen, 0)
        b = codes.astype(jnp.int32)
        valid = (
            mapped[:, None]
            & (col_j < lens[:, None])
            & (cols >= 0)
            & (cols < Lp)
            & (b < 4)
        )
        lin = (gene_true[:, None] * Lp + jnp.clip(cols, 0, Lp - 1)) * 4 + jnp.clip(b, 0, 3)
        lin = jnp.where(valid, lin, G * Lp * 4)
        pile = pile.at[lin.reshape(-1)].add(1.0)
    pileup = pile[:-1].reshape(G, Lp, 4)
    depth_local = pileup.sum(axis=-1)

    # SNP evidence at catalogued positions (local counts; the likelihood
    # is linear, so psum of per-chip logliks equals the global one)
    vg = arr.var_gene
    vp = jnp.clip(arr.var_pos, 0, Lp - 1)
    snp = arr.var_alt >= 0
    pos_cnt = pileup[vg, vp, jnp.clip(arr.var_alt, 0, 3)]
    pos_cnt = jnp.where(snp, pos_cnt, 0.0)
    neg_cnt = jnp.where(snp, depth_local[vg, vp] - pos_cnt, 0.0)
    core = jnp.dot(
        pos_cnt - neg_cnt, arr.membership, preferred_element_type=jnp.float32
    )
    allele_loglik = core * (LOG_HIT - LOG_MISS) + (
        pos_cnt.sum() * LOG_MISS + neg_cnt.sum() * LOG_HIT
    )

    depth = depth_local
    if axis_name:
        depth = jax.lax.psum(depth, axis_name)
        allele_loglik = jax.lax.psum(allele_loglik, axis_name)

    # CN histogram over true genes only (pseudo rows remap to parents, so
    # their depth rows are structurally zero)
    gene_len = jnp.maximum(arr.lengths[: arr.n_true].astype(jnp.float32), 1.0)
    gene_depth = depth[: arr.n_true].sum(axis=1) / gene_len
    hist = jnp.zeros((cn_bins,), dtype=jnp.float32)
    bin_idx = jnp.clip((gene_depth / 2.0).astype(jnp.int32), 0, cn_bins - 1)
    hist = hist.at[bin_idx].add(1.0)
    # hist derives from the already-psum'd depth: identical per chip
    return depth, hist, allele_loglik


def makeShardedCohortStep(mesh: Mesh, arr: DeviceIndexArrays, top_c: int = 2):
    """jit the cohort step over the mesh with real shardings:
    reads -> P('data'), membership -> P(None, 'model'), outputs replicated."""
    from jax import shard_map

    def step(codes1, len1, codes2, len2, rc1, rc2, membership):
        local_arr = DeviceIndexArrays(
            **{
                **{k: getattr(arr, k) for k in arr.__dataclass_fields__},
                "membership": membership,
            }
        )
        depth, hist, loglik = cohortStep(
            local_arr, codes1, len1, codes2, len2, rc1, rc2, top_c=top_c
        )
        # allele axis sharded over 'model': gather for a replicated result
        loglik = jax.lax.all_gather(loglik, "model", tiled=True)
        return depth, hist, loglik

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("data"), P("data"), P("data"), P("data"), P("data"), P("data"),
            P(None, "model"),
        ),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
