"""
Banded variant-aware glocal alignment DP.

Scores a read end-to-end against a backbone window where catalogued SNP
alts match for free (alt_mask bit) and catalogued deletion columns skip for
~free — i.e. the graph alignment of HISAT2 collapsed onto the backbone
coordinate system (possible because the catalog has no insertion variants,
see index/variants.py).  Costs therefore count only *novel* edits, matching
hisat2's NM semantics used by the reference filter (hisat2.py:541-578).

State: (i, off) = read base i consumed at window column i + off.
Transitions per row i:
  diag  (i-1, off)   -> (i, off): + 0/1 (match / novel SNP)
  ins   (i-1, off+1) -> (i, off): + INS_COST (novel insertion in read)
  del   (i, off')    -> (i, off) for off' < off: + sum of per-column skip
        costs (catalogued deletion column: DEL_EPS, novel: DEL_COST)
The in-row deletion relaxation is a prefix-min over (tmp - cumsum(skip)),
computed with an associative scan — the whole DP is vectorised over
[jobs, band] with a lax.scan over read positions.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class AlignParams:
    band: int = 48            # diagonal offsets explored per read
    read_len: int = 160       # padded read length (static)
    mismatch: float = 1.0
    ins_cost: float = 2.0
    del_cost: float = 2.0     # per novel deleted column
    del_eps: float = 1.0 / 64 # per catalogued deleted column
    big: float = 1e9

    @property
    def window(self) -> int:
        return self.read_len + self.band


def _cumminWithArg(values: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Leftmost running argmin along the last axis (log-step doubling;
    associative_scan compiles pathologically on some TPU backends)."""
    n = values.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n), values.shape)
    val = values
    s = 1
    big = jnp.asarray(1e30, values.dtype)
    while s < n:
        pad_v = jnp.full(values.shape[:-1] + (s,), big, values.dtype)
        pad_i = jnp.zeros(values.shape[:-1] + (s,), idx.dtype)
        sv = jnp.concatenate([pad_v, val[..., :-s]], axis=-1)
        si = jnp.concatenate([pad_i, idx[..., :-s]], axis=-1)
        take_earlier = sv <= val  # ties -> leftmost
        val = jnp.where(take_earlier, sv, val)
        idx = jnp.where(take_earlier, si, idx)
        s *= 2
    return val, idx


def _subCost(read_base: jax.Array, wbase: jax.Array, walt: jax.Array, p: AlignParams) -> jax.Array:
    """0 if base matches backbone or a catalogued SNP alt, else mismatch."""
    rb = read_base[:, None]
    is_known_alt = ((walt >> rb.astype(jnp.uint8)) & 1).astype(bool) & (rb < 4)
    match = (rb == wbase) & (rb < 4)
    return jnp.where(match | is_known_alt, 0.0, p.mismatch)


@partial(jax.jit, static_argnames=("p",))
def bandedScore(
    wbase: jax.Array,     # [J, W] int8 backbone window
    walt: jax.Array,      # [J, W] uint8 SNP-alt bitmask
    wdel: jax.Array,      # [J, W] float32 per-column skip cost
    reads: jax.Array,     # [J, RL] int8
    read_len: jax.Array,  # [J] int32
    p: AlignParams,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (cost [J] f32, end_off [J] i32, lin_end [J] f32): best alignment
    cost, final band offset, and the PURE-DIAGONAL substitution cost at
    that offset (score-only pass, no pointers).

    lin_end == cost iff the optimum is gapless at the winning offset —
    the aligner's "easy" shortcut decision (its traceback can be
    synthesized without the pointer DP); tracking it here costs one
    accumulator row instead of a 2x[J, RL] window re-gather downstream."""
    J = wbase.shape[0]
    B = p.band

    def step(carry, i):
        prev, lin, best_cost, best_off, best_lin = carry
        wb = jax.lax.dynamic_slice(wbase, (0, i), (J, B))
        wa = jax.lax.dynamic_slice(walt, (0, i), (J, B))
        wd = jax.lax.dynamic_slice(wdel, (0, i), (J, B))
        sub = _subCost(reads[:, i], wb, wa, p)
        m = prev + sub
        lin = lin + sub
        ins = jnp.concatenate(
            [prev[:, 1:], jnp.full((J, 1), p.big)], axis=1
        ) + p.ins_cost
        tmp = jnp.minimum(m, ins)
        d_prefix = jnp.cumsum(wd, axis=1)
        row, _ = _cumminWithArg(tmp - d_prefix)
        row = row + d_prefix
        at_end = i == (read_len - 1)
        row_min = row.min(axis=1)
        row_arg = row.argmin(axis=1)
        lin_at = jnp.take_along_axis(lin, row_arg[:, None], axis=1)[:, 0]
        best_cost = jnp.where(at_end, row_min, best_cost)
        best_off = jnp.where(at_end, row_arg, best_off)
        best_lin = jnp.where(at_end, lin_at, best_lin)
        return (row, lin, best_cost, best_off, best_lin), None

    init = (
        jnp.zeros((J, B), dtype=jnp.float32),
        jnp.zeros((J, B), dtype=jnp.float32),
        jnp.full((J,), p.big, dtype=jnp.float32),
        jnp.zeros((J,), dtype=jnp.int32),
        jnp.full((J,), p.big, dtype=jnp.float32),
    )
    (_, _, best_cost, best_off, best_lin), _ = jax.lax.scan(
        step, init, jnp.arange(p.read_len)
    )
    return best_cost, best_off.astype(jnp.int32), best_lin


@partial(jax.jit, static_argnames=("p",))
def bandedScoreBytes(
    wbytes: jax.Array,    # [J, W] uint8: bits 0-3 alts, bit 4 del, bits 5-7 base
    reads: jax.Array,     # [J, RL] int8
    read_len: jax.Array,  # [J] int32
    p: AlignParams,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """XLA fallback for the packed byte-plane window format
    (ops/dp_pallas.py:packWindowBytes)."""
    wb = (wbytes >> 5).astype(jnp.int8)
    wa = wbytes & 0xF
    wd = jnp.where((wbytes >> 4) & 1 > 0, p.del_eps, p.del_cost).astype(jnp.float32)
    return bandedScore(wb, wa, wd, reads, read_len, p)


@partial(jax.jit, static_argnames=("p",))
def bandedTraceback(
    wbase: jax.Array,
    walt: jax.Array,
    wdel: jax.Array,
    reads: jax.Array,
    read_len: jax.Array,
    p: AlignParams,
) -> tuple[jax.Array, jax.Array]:
    """Full pass with pointers; -> (cost [J], cols [J, RL] i32).

    cols[j, i] = window column where read base i was consumed (-1 past the
    read end).  Deletions appear as gaps between consecutive cols; an
    insertion repeats the previous column (col[i+1] == col[i]).
    """
    J = wbase.shape[0]
    B = p.band

    def fwd(carry, i):
        prev, best_cost, best_off = carry
        wb = jax.lax.dynamic_slice(wbase, (0, i), (J, B))
        wa = jax.lax.dynamic_slice(walt, (0, i), (J, B))
        wd = jax.lax.dynamic_slice(wdel, (0, i), (J, B))
        sub = _subCost(reads[:, i], wb, wa, p)
        m = prev + sub
        ins = jnp.concatenate(
            [prev[:, 1:], jnp.full((J, 1), p.big)], axis=1
        ) + p.ins_cost
        is_ins = ins < m
        tmp = jnp.where(is_ins, ins, m)
        d_prefix = jnp.cumsum(wd, axis=1)
        row, arg = _cumminWithArg(tmp - d_prefix)
        row = row + d_prefix
        at_end = i == (read_len - 1)
        best_cost = jnp.where(at_end, row.min(axis=1), best_cost)
        best_off = jnp.where(at_end, row.argmin(axis=1).astype(jnp.int32), best_off)
        return (row, best_cost, best_off), (arg.astype(jnp.uint8), is_ins)

    init = (
        jnp.zeros((J, B), dtype=jnp.float32),
        jnp.full((J,), p.big, dtype=jnp.float32),
        jnp.zeros((J,), dtype=jnp.int32),
    )
    (prev, best_cost, best_off), (ptr, insbit) = jax.lax.scan(
        fwd, init, jnp.arange(p.read_len)
    )
    # ptr: [RL, J, B] chosen tmp index; insbit: [RL, J, B] ins-vs-diag at tmp

    jidx = jnp.arange(J)

    def bwd(off, i):
        active = i <= (read_len - 1)
        off = jnp.where(i == (read_len - 1), best_off, off)
        src = ptr[i][jidx, off]                     # off' where base i consumed
        took_ins = insbit[i][jidx, src]
        # inserted base consumes no column: marked -2
        col = jnp.where(
            active,
            jnp.where(took_ins, -2, i + src.astype(jnp.int32)),
            -1,
        )
        prev_off = jnp.where(took_ins, src.astype(jnp.int32) + 1, src.astype(jnp.int32))
        off = jnp.where(active, prev_off, off)
        return off, col

    _, cols_rev = jax.lax.scan(
        bwd,
        jnp.zeros((J,), dtype=jnp.int32),
        jnp.arange(p.read_len - 1, -1, -1),
    )
    cols = cols_rev[::-1].T                          # [J, RL]
    return best_cost, cols


# ---------------------------------------------------------------------------
# gather-inside-jit wrappers: jobs are (gene, window-start) pairs; the window
# slices are gathered from the padded index arrays ON DEVICE, so the host
# uploads only tiny job vectors + read codes.  The traceback is returned
# delta-compressed (int8) because device->host bandwidth is the bottleneck
# on tunneled TPUs.
# ---------------------------------------------------------------------------

def _gatherWindowsPacked(backbone, altdel, gene, w0, pad_l: int, W: int, p: AlignParams):
    """Gather 2 byte-planes instead of 3 (delcost f32 was 2/3 of gather
    bytes): altdel bits 0-3 = SNP alt mask, bit 4 = catalogued-deletion
    column; the f32 skip cost is synthesized in-register."""
    idx = (w0[:, None] + pad_l) + jnp.arange(W)[None, :]
    g = gene[:, None]
    wb = backbone[g, idx]
    wad = altdel[g, idx]
    wd = jnp.where((wad >> 4) & 1 > 0, p.del_eps, p.del_cost).astype(jnp.float32)
    return wb, wad & 0xF, wd


@partial(jax.jit, static_argnames=("p", "pad_l"))
def bandedScoreGather(
    backbone: jax.Array,   # [G, Lpad] int8
    altdel: jax.Array,     # [G, Lpad] uint8 (bits 0-3 alts, bit 4 del_ok)
    gene: jax.Array,       # [J] int32 (clipped valid)
    w0: jax.Array,         # [J] int32 window start (absolute - pad_l handled)
    reads: jax.Array,      # [J, RL] int8
    read_len: jax.Array,   # [J] int32
    p: AlignParams,
    pad_l: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    wb, wa, wd = _gatherWindowsPacked(backbone, altdel, gene, w0, pad_l, p.window, p)
    return bandedScore(wb, wa, wd, reads, read_len, p)


@partial(jax.jit, static_argnames=("p", "pad_l"))
def bandedTracebackGather(
    backbone: jax.Array,
    altdel: jax.Array,
    gene: jax.Array,
    w0: jax.Array,
    reads: jax.Array,
    read_len: jax.Array,
    p: AlignParams,
    pad_l: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (cost [J] f32, start_col [J] i32 window-relative, delta [J, RL] i8)

    delta encoding per base i: -1 past read end; 0 inserted base (consumes
    no column); k>=1 column step from the previous consumed base (k-1
    deleted columns in between).  delta[first consumed base] == 1 and
    start_col is that base's column.
    """
    wb, wa, wd = _gatherWindowsPacked(backbone, altdel, gene, w0, pad_l, p.window, p)
    cost, cols = bandedTraceback(wb, wa, wd, reads, read_len, p)

    J, RL = cols.shape
    consumed = cols >= 0
    # previous consumed column at each position: running max via log-step
    # doubling (associative_scan compiles pathologically on some backends)
    prev_max = jnp.where(consumed, cols, -1)
    s = 1
    while s < RL:
        shifted = jnp.concatenate(
            [jnp.full((J, s), -1, prev_max.dtype), prev_max[:, :-s]], axis=1
        )
        prev_max = jnp.maximum(prev_max, shifted)
        s *= 2
    prev_shift = jnp.concatenate([jnp.full((J, 1), -1), prev_max[:, :-1]], axis=1)
    first_consumed = consumed & (prev_shift < 0)
    past_end = jnp.arange(RL)[None, :] >= read_len[:, None]
    delta = jnp.where(
        past_end,
        -1,
        jnp.where(
            cols == -2,
            0,
            jnp.where(first_consumed, 1, jnp.clip(cols - prev_shift, 0, 127)),
        ),
    ).astype(jnp.int8)
    start_col = jnp.max(jnp.where(first_consumed, cols, -1), axis=1).astype(jnp.int32)
    return cost, start_col, delta


@partial(jax.jit, static_argnames=("p", "pad_l"))
def bandedTracebackPacked(
    backbone: jax.Array,
    altdel: jax.Array,
    gene: jax.Array,
    w0: jax.Array,
    reads: jax.Array,
    read_len: jax.Array,
    p: AlignParams,
    pad_l: int,
) -> jax.Array:
    """bandedTracebackGather with the host-bound outputs fused into ONE
    int8 array [J, RL+2]: columns [0, RL) = the delta stream, column RL =
    start_col low byte, RL+1 = start_col high byte (start_col is
    window-relative, < p.window << 2^15, so int16 always fits; -1 "no
    consumed base" round-trips as lo=0xFF, hi=-1).  One device->host
    transfer instead of three per traceback chunk — a tunneled link
    charges per-transfer latency.  The per-mate DP cost stays on device
    (the column finalize never reads it)."""
    _, start_col, delta = bandedTracebackGather(
        backbone, altdel, gene, w0, reads, read_len, p, pad_l
    )
    lo = (start_col & 0xFF).astype(jnp.int8)
    hi = (start_col >> 8).astype(jnp.int8)
    return jnp.concatenate([delta, lo[:, None], hi[:, None]], axis=1)


def unpackTraceback(pk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[J, RL+2] int8 (bandedTracebackPacked download) ->
    (start_col [J] i32, delta [J, RL] i8 view with row stride RL+2)."""
    RL = pk.shape[1] - 2
    lo = pk[:, RL].view(np.uint8).astype(np.int32)
    hi = pk[:, RL + 1].astype(np.int32)
    return (hi << 8) | lo, pk[:, :RL]


def decodeDeltas(start_col: np.ndarray, delta: np.ndarray) -> np.ndarray:
    """Host-side inverse of the delta encoding -> cols [J, RL] (abs window
    coords; -1 pad, -2 insertion).  int32 throughout: max cumulative step
    is 127 * RL, far below 2^31."""
    step = np.where(delta > 0, delta, 0).astype(np.int32)
    cum = np.cumsum(step, axis=1, dtype=np.int32)
    cols = start_col[:, None].astype(np.int32) - 1 + cum
    cols = np.where(delta == 0, -2, cols)
    cols = np.where(delta < 0, -1, cols)
    return cols
