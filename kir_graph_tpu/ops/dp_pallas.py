"""
Pallas TPU kernel for the banded variant-aware DP (score pass).

Same recurrence as align/dp.py:bandedScore, laid out for the VPU:

* 128 alignment jobs ride the lane axis, the 48-wide band rides sublanes;
  the whole DP state for a block is a [48, 128] f32 tile that never leaves
  VMEM.
* window/read arrays arrive transposed ([W, J], [RL, J]) so each grid step
  works on a (W|RL, 128) VMEM block.
* the in-row deletion relaxation (prefix-min of tmp - cumsum(skip)) uses
  log2(B) shifted-min steps — no scan carries, no tuple reductions.

The XLA fallback (align/dp.py) remains the reference implementation; this
kernel must produce identical costs (tests/test_pallas.py).
"""
from __future__ import annotations

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

LANES = 128
BIG = 1e9


def pallasAvailable() -> bool:
    return _PALLAS


def _kernel(p: AlignParams):
    B = p.band
    RL = p.read_len
    shifts = [1 << s for s in range(int(np.ceil(np.log2(max(B, 2)))))]

    GROUP = 8  # Mosaic requires sublane slice starts provably 8-aligned:
    #            slice B+GROUP rows at 8*group, then shift in registers
    assert RL % GROUP == 0

    def kernel(wb_ref, wa_ref, wd_ref, reads_ref, len_ref, cost_ref, end_ref):
        def oneRow(i, wb, wa, wd, rb, carry):
            """One DP row given in-register window slices [B, L]."""
            prev, best_cost, best_off = carry
            is_match = (rb == wb.astype(jnp.int32)) & (rb < 4)
            is_alt = (((wa >> rb) & 1) > 0) & (rb < 4)
            sub = jnp.where(is_match | is_alt, 0.0, p.mismatch)

            m = prev + sub
            ins = (
                jnp.concatenate(
                    [prev[1:, :], jnp.full((1, LANES), BIG, jnp.float32)], axis=0
                )
                + p.ins_cost
            )
            tmp = jnp.minimum(m, ins)

            # inclusive prefix sum along the band (no cumsum lowering on
            # TPU pallas): Hillis-Steele doubling
            dpre = wd
            for s in shifts:
                dpre = dpre + jnp.concatenate(
                    [jnp.zeros((s, LANES), jnp.float32), dpre[:-s, :]], axis=0
                )
            a = tmp - dpre
            for s in shifts:
                shifted = jnp.concatenate(
                    [jnp.full((s, LANES), BIG, jnp.float32), a[:-s, :]], axis=0
                )
                a = jnp.minimum(a, shifted)
            row = a + dpre

            at_end = (i == (len_ref[0, :] - 1))[None, :]
            row_min = jnp.min(row, axis=0, keepdims=True)
            row_arg = jnp.argmin(row, axis=0).astype(jnp.int32)[None, :]
            best_cost = jnp.where(at_end, row_min, best_cost)
            best_off = jnp.where(at_end, row_arg, best_off)
            return row, best_cost, best_off

        def group(g, carry):
            base = pl.multiple_of(g * GROUP, GROUP)
            wb_blk = wb_ref[pl.ds(base, B + GROUP), :]
            wa_blk = wa_ref[pl.ds(base, B + GROUP), :].astype(jnp.int32)
            wd_blk = wd_ref[pl.ds(base, B + GROUP), :]
            rb_blk = reads_ref[pl.ds(base, GROUP), :].astype(jnp.int32)
            for k in range(GROUP):
                carry = oneRow(
                    g * GROUP + k,
                    wb_blk[k : k + B, :],
                    wa_blk[k : k + B, :],
                    wd_blk[k : k + B, :],
                    rb_blk[k, :][None, :],
                    carry,
                )
            return carry

        init = (
            jnp.zeros((B, LANES), jnp.float32),
            jnp.full((1, LANES), BIG, jnp.float32),
            jnp.zeros((1, LANES), jnp.int32),
        )
        _, best_cost, best_off = jax.lax.fori_loop(0, RL // GROUP, group, init)
        cost_ref[:] = best_cost
        end_ref[:] = best_off

    return kernel


@partial(jax.jit, static_argnames=("p", "interpret"))
def bandedScorePallas(
    wbase: jax.Array,     # [J, W] int8
    walt: jax.Array,      # [J, W] uint8
    wdel: jax.Array,      # [J, W] f32
    reads: jax.Array,     # [J, RL] int8
    read_len: jax.Array,  # [J] int32
    p: AlignParams,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in replacement for align.dp.bandedScore (score-only pass)."""
    assert _PALLAS, "pallas unavailable"
    J = wbase.shape[0]
    Jp = -(-J // LANES) * LANES
    pad = Jp - J
    if pad:
        wbase = jnp.pad(wbase, ((0, pad), (0, 0)), constant_values=4)
        walt = jnp.pad(walt, ((0, pad), (0, 0)))
        wdel = jnp.pad(wdel, ((0, pad), (0, 0)), constant_values=p.del_cost)
        reads = jnp.pad(reads, ((0, pad), (0, 0)), constant_values=4)
        read_len = jnp.pad(read_len, (0, pad), constant_values=1)

    cost, end = _pallasCall(wbase, walt, wdel, reads, read_len, p, interpret, Jp)
    return cost[0, :J], end[0, :J]


def _pallasCall(wbase, walt, wdel, reads, read_len, p, interpret, Jp):
    W = p.window
    RL = p.read_len
    grid = (Jp // LANES,)
    return pl.pallas_call(
        _kernel(p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((W, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RL, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Jp), jnp.float32),
            jax.ShapeDtypeStruct((1, Jp), jnp.int32),
        ),
        interpret=interpret,
    )(
        wbase.T, walt.T, wdel.T, reads.T, read_len[None, :]
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
) -> tuple[jax.Array, jax.Array]:
    """Gather-inside-jit variant (drop-in for dp.bandedScoreGather)."""
    from ..align.dp import _gatherWindowsPacked

    wb, wa, wd = _gatherWindowsPacked(backbone, altdel, gene, w0, pad_l, p.window, p)
    return bandedScorePallas(wb, wa, wd, reads, read_len, p, interpret=interpret)
