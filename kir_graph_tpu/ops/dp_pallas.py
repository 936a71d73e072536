"""
Pallas TPU kernel for the banded variant-aware DP (score pass).

Same recurrence as align/dp.py:bandedScore, laid out for the VPU:

* 128 alignment jobs ride the lane axis, the 48-wide band rides sublanes;
  the whole DP state for a block is a [48, 128] f32 tile that never leaves
  VMEM.
* window/read arrays arrive transposed ([W, J], [RL, J]) so each grid step
  works on a (W|RL, 128) VMEM block.
* the whole reference window arrives as ONE byte plane (bits 0-3 SNP-alt
  mask, bit 4 catalogued-deletion, bits 5-7 base code) — a third of the
  HBM traffic of three separate planes, and the per-column skip cost is
  synthesized in registers.
* the in-row deletion relaxation (prefix-min of tmp - prefix(skip)) uses
  log2(B) shifted-min steps — no scan carries, no tuple reductions.  The
  skip prefix is hoisted: computed once per 8-row group (the per-row band
  slice only differs by a constant, which cancels between the subtract
  and the add).
* the end-of-read min/argmin reduction runs under lax.cond — with 150 bp
  reads only ~2 of 160 rows contain any read end.

The XLA fallback (align/dp.py) remains the reference implementation; this
kernel must produce identical costs (tests/test_pallas.py).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..align.dp import AlignParams

try:  # pallas import is TPU/CPU-interpret friendly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except Exception:  # pragma: no cover
    _PALLAS = False

LANES = int(os.environ.get("KGT_DP_LANES", "128"))
BIG = 1e9


def pallasAvailable() -> bool:
    return _PALLAS


def _kernel(p: AlignParams, want_lin: bool = True):
    B = p.band
    RL = p.read_len
    scan_shifts = [1 << s for s in range(int(np.ceil(np.log2(max(B, 2)))))]

    # Mosaic requires sublane slice starts provably 8-aligned: slice
    # B+GROUP rows at GROUP*g, then shift in registers.  Env-tunable for
    # per-generation tuning (must divide RL and be a multiple of 8).
    GROUP = int(os.environ.get("KGT_DP_GROUP", "8"))
    assert GROUP % 8 == 0
    SLICE = B + GROUP
    pre_shifts = [1 << s for s in range(int(np.ceil(np.log2(SLICE))))]
    assert RL % GROUP == 0

    def kernel(wbytes_ref, reads_ref, len_ref, cost_ref, end_ref,
               *maybe_lin_ref):
        lens = len_ref[0, :]
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (B, LANES), 0)

        def oneRow(i, wa5, dpre, rb, carry):
            """One DP row given in-register window slices [B, L].

            wa5 is the per-column acceptance mask: alt bits 0-3 with the
            backbone base's bit OR'd in (hoisted per group), so the whole
            match-or-known-alt test is ONE AND against the read base's
            bit — the kernel is instruction-issue bound, every per-row op
            counts.  dpre is the skip-cost prefix over the *group* slice;
            per row it differs from the band-local prefix by a constant,
            which cancels between the subtract and the add around the
            min-scan.
            """
            prev, lin, best_cost, best_off, best_lin = carry
            # variable shift once on the [1, L] read row; rb == 4 (N/pad)
            # gets bit value 0 -> always a mismatch, like the oracle
            rb_bit = jnp.where(rb < 4, 1 << rb, 0)
            sub = jnp.where((wa5 & rb_bit) > 0, 0.0, p.mismatch)

            m = prev + sub
            if want_lin:  # pure-diagonal cost per band offset
                lin = lin + sub
            ins = (
                jnp.concatenate(
                    [prev[1:, :], jnp.full((1, LANES), BIG, jnp.float32)], axis=0
                )
                + p.ins_cost
            )
            a = jnp.minimum(m, ins) - dpre
            for s in scan_shifts:
                shifted = jnp.concatenate(
                    [jnp.full((s, LANES), BIG, jnp.float32), a[:-s, :]], axis=0
                )
                a = jnp.minimum(a, shifted)
            row = a + dpre

            at_end = (i == (lens - 1))[None, :]

            def reduceEnd(c):
                bc, bo, bl = c
                row_min = jnp.min(row, axis=0, keepdims=True)
                row_arg = jnp.argmin(row, axis=0).astype(jnp.int32)[None, :]
                if want_lin:
                    # lin at the winning offset: masked sum (no sublane
                    # gather)
                    lin_at = jnp.sum(
                        jnp.where(band_iota == row_arg, lin, 0.0),
                        axis=0, keepdims=True,
                    )
                    bl = jnp.where(at_end, lin_at, bl)
                return (
                    jnp.where(at_end, row_min, bc),
                    jnp.where(at_end, row_arg, bo),
                    bl,
                )

            best_cost, best_off, best_lin = jax.lax.cond(
                jnp.any(at_end), reduceEnd, lambda c: c,
                (best_cost, best_off, best_lin),
            )
            return row, lin, best_cost, best_off, best_lin

        def group(g, carry):
            base = pl.multiple_of(g * GROUP, GROUP)
            blk = wbytes_ref[pl.ds(base, SLICE), :].astype(jnp.int32)
            # acceptance mask: alt bits | backbone-base bit (wb in 0..7;
            # values >= 4 — pad/N columns — set bits the read bit never
            # tests, i.e. always mismatch)
            wa5_blk = (blk & 0xF) | (1 << (blk >> 5))
            wd_blk = jnp.where(
                ((blk >> 4) & 1) > 0, p.del_eps, p.del_cost
            ).astype(jnp.float32)
            # inclusive skip-cost prefix over the slice, once per 8 rows
            dP = wd_blk
            for s in pre_shifts:
                dP = dP + jnp.concatenate(
                    [jnp.zeros((s, LANES), jnp.float32), dP[:-s, :]], axis=0
                )
            rb_blk = reads_ref[pl.ds(base, GROUP), :].astype(jnp.int32)
            for k in range(GROUP):
                carry = oneRow(
                    g * GROUP + k,
                    wa5_blk[k : k + B, :],
                    dP[k : k + B, :],
                    rb_blk[k, :][None, :],
                    carry,
                )
            return carry

        init = (
            jnp.zeros((B, LANES), jnp.float32),
            jnp.zeros((B, LANES), jnp.float32),
            jnp.full((1, LANES), BIG, jnp.float32),
            jnp.zeros((1, LANES), jnp.int32),
            jnp.full((1, LANES), BIG, jnp.float32),
        )
        _, _, best_cost, best_off, best_lin = jax.lax.fori_loop(
            0, RL // GROUP, group, init
        )
        cost_ref[:] = best_cost
        end_ref[:] = best_off
        if want_lin:
            maybe_lin_ref[0][:] = best_lin

    return kernel


def packWindowBytes(wbase: jax.Array, walt: jax.Array, is_del: jax.Array) -> jax.Array:
    """(base [.., W] int, alt-mask [.., W] uint8, del-flag [.., W] bool)
    -> one byte plane: bits 0-3 alts, bit 4 del, bits 5-7 base code."""
    return (
        (wbase.astype(jnp.uint8) << 5)
        | (is_del.astype(jnp.uint8) << 4)
        | (walt.astype(jnp.uint8) & 0xF)
    )


@partial(jax.jit, static_argnames=("p", "interpret", "want_lin"))
def bandedScorePallasBytes(
    wbytes: jax.Array,    # [J, W] uint8 packed window plane
    reads: jax.Array,     # [J, RL] int8
    read_len: jax.Array,  # [J] int32
    p: AlignParams,
    interpret: bool = False,
    want_lin: bool = True,
) -> tuple[jax.Array, jax.Array, jax.Array | None]:
    """Score pass over packed byte-plane windows (see packWindowBytes).
    -> (cost, end_off, lin_end) as in align.dp.bandedScore; lin_end is
    None when want_lin=False (skips the extra accumulator entirely —
    the cohort device path never reads it)."""
    assert _PALLAS, "pallas unavailable"
    J = wbytes.shape[0]
    Jp = -(-J // LANES) * LANES
    pad = Jp - J
    PAD_BYTE = 4 << 5  # pad base code, no alts, novel-deletion cost
    if pad:
        wbytes = jnp.pad(wbytes, ((0, pad), (0, 0)), constant_values=PAD_BYTE)
        reads = jnp.pad(reads, ((0, pad), (0, 0)), constant_values=4)
        read_len = jnp.pad(read_len, (0, pad), constant_values=1)

    out = _pallasCall(wbytes, reads, read_len, p, interpret, Jp, want_lin)
    if want_lin:
        cost, end, lin = out
        return cost[0, :J], end[0, :J], lin[0, :J]
    cost, end = out
    return cost[0, :J], end[0, :J], None


@partial(jax.jit, static_argnames=("p", "interpret"))
def bandedScorePallas(
    wbase: jax.Array,     # [J, W] int8
    walt: jax.Array,      # [J, W] uint8
    wdel: jax.Array,      # [J, W] f32
    reads: jax.Array,     # [J, RL] int8
    read_len: jax.Array,  # [J] int32
    p: AlignParams,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for align.dp.bandedScore (score-only pass).

    Packs the three window planes into one byte plane in XLA (elementwise,
    fuses) and runs the byte-plane kernel.
    """
    wbytes = packWindowBytes(wbase, walt, wdel == p.del_eps)
    return bandedScorePallasBytes(wbytes, reads, read_len, p, interpret=interpret)


def _pallasCall(wbytes, reads, read_len, p, interpret, Jp, want_lin=True):
    W = p.window
    RL = p.read_len
    grid = (Jp // LANES,)
    spec = pl.BlockSpec((1, LANES), lambda j: (0, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel(p, want_lin),
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RL, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(spec,) * (3 if want_lin else 2),
        out_shape=(
            jax.ShapeDtypeStruct((1, Jp), jnp.float32),
            jax.ShapeDtypeStruct((1, Jp), jnp.int32),
        ) + ((jax.ShapeDtypeStruct((1, Jp), jnp.float32),) if want_lin else ()),
        interpret=interpret,
    )(
        wbytes.T, reads.T, read_len[None, :]
    )


@partial(jax.jit, static_argnames=("p", "pad_l", "interpret"))
def bandedScorePallasGather(
    backbone: jax.Array,
    altdel: jax.Array,
    gene: jax.Array,
    w0: jax.Array,
    reads: jax.Array,
    read_len: jax.Array,
    p: AlignParams,
    pad_l: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Gather-inside-jit variant (drop-in for dp.bandedScoreGather)."""
    from ..align.dp import _gatherWindowsPacked

    wb, wa, wd = _gatherWindowsPacked(backbone, altdel, gene, w0, pad_l, p.window, p)
    return bandedScorePallas(wb, wa, wd, reads, read_len, p, interpret=interpret)
