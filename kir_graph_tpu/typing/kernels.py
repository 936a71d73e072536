"""
Jitted array kernels for allele typing.

The reads x alleles likelihood matrix and the beam-search score reduction
are the compute-heavy parts of typing (reference hot loop 3,
typing_mulit_allele.py:340-381, 478-598).  Both are expressed as dense XLA
ops: the likelihood matrix is literally one matmul (MXU), and the pair-max
reduction is a chunked VPU reduction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LOG_HIT = float(np.log10(0.999))
LOG_MISS = float(np.log10(0.001))


@jax.jit
def logProbsFromCounts(
    count_diff: jax.Array,  # [R, V] float32: (#pos occurrences - #neg occurrences)
    n_pos: jax.Array,       # [R] float32
    n_neg: jax.Array,       # [R] float32
    membership: jax.Array,  # [V, A] float32
) -> jax.Array:
    """log10 P(read | allele) for every read/allele pair.

    Derivation: each positive occurrence of variant v contributes
    log(0.999) if the allele carries v else log(0.001); negatives the
    reverse.  Summing over occurrences collapses to a single matmul:

      L = (Cpos - Cneg) @ M * (log_hit - log_miss)
          + n_pos * log_miss + n_neg * log_hit
    """
    core = jnp.dot(count_diff, membership, preferred_element_type=jnp.float32)
    return (
        core * (LOG_HIT - LOG_MISS)
        + n_pos[:, None] * LOG_MISS
        + n_neg[:, None] * LOG_HIT
    )


@partial(jax.jit, static_argnames=("chunk",))
def pairMaxScores(
    log_probs: jax.Array,   # [R, A]
    prev_probs: jax.Array,  # [R, T] per-read best within each previous set
    chunk: int = 32,
) -> jax.Array:
    """score[t, a] = sum_r max(log_probs[r, a], prev_probs[r, t]).

    The beam-search extension step (reference
    typing_mulit_allele.py:540-542) chunked over T so the [R, T, A]
    intermediate never materialises in full.
    """
    R, A = log_probs.shape
    T = prev_probs.shape[1]
    pad_t = (-T) % chunk
    prev = jnp.pad(prev_probs, ((0, 0), (0, pad_t)), constant_values=0.0)
    n_chunks = prev.shape[1] // chunk

    def body(carry, tchunk):  # tchunk: [R, chunk]
        s = jnp.maximum(log_probs[:, None, :], tchunk[:, :, None]).sum(axis=0)
        return carry, s  # s: [chunk, A]

    _, scores = jax.lax.scan(
        body, None, prev.reshape(R, n_chunks, chunk).transpose(1, 0, 2)
    )
    return scores.reshape(n_chunks * chunk, A)[:T]


@jax.jit
def fractionOfReads(
    log_probs: jax.Array,  # [R, A]
    ids: jax.Array,        # [T, n]
    top_prob: jax.Array,   # [R, T]
) -> jax.Array:
    """Share of reads whose per-set max is attained by each member allele
    (ties split evenly) — reference typing_mulit_allele.py:575-580."""
    sel = log_probs[:, ids]                                   # [R, T, n]
    belong = (sel == top_prob[:, :, None]).astype(jnp.float32)
    belong = belong / belong.sum(axis=2, keepdims=True)
    return belong.sum(axis=0) / log_probs.shape[0]            # [T, n]


# ----------------------------------------------------------------------
# host twins: identical semantics in plain numpy.
#
# Typing's matrices are tiny relative to alignment (R~2-10k reads x
# A~40-400 alleles x T<=top_n sets: tens of MFLOPs per gene).  On a
# locally attached chip the device beam is essentially free, but when the
# accelerator sits behind a high-latency tunnel every dispatch costs
# 100-500 ms and the device path loses by an order of magnitude (measured
# 29 s vs 4 s per 15-gene sample, docs/BENCH_NOTES.md round 5).  The
# AlleleTyping driver picks a path per gene (KGT_TYPING_DEVICE=1/0
# forces); both produce the same calls, and the final f64 host rescore
# (rescoreF64) re-derives exact values either way.
# ----------------------------------------------------------------------
def logProbsFromCountsHost(
    count_diff: np.ndarray,
    n_pos: np.ndarray,
    n_neg: np.ndarray,
    membership: np.ndarray,
) -> np.ndarray:
    core = count_diff @ membership
    return (
        core * np.float32(LOG_HIT - LOG_MISS)
        + n_pos[:, None] * np.float32(LOG_MISS)
        + n_neg[:, None] * np.float32(LOG_HIT)
    ).astype(np.float32)


def beamExtendHost(
    log_probs: np.ndarray,
    prev_prob: np.ndarray,
    prev_h1: np.ndarray,
    prev_h2: np.ndarray,
    ah1: np.ndarray,
    ah2: np.ndarray,
    k: int,
    chunk: int = 32,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """numpy beamExtend: same dedup (commutative two-hash, first flat
    index kept) and same stable descending top-k tie order."""
    R, A = log_probs.shape
    T = prev_prob.shape[1]
    scores = np.empty((T, A), np.float32)
    for s in range(0, T, chunk):  # bound the [R, chunk, A] intermediate
        pc = prev_prob[:, s : s + chunk]
        scores[s : s + chunk] = np.maximum(
            log_probs[:, None, :], pc[:, :, None]
        ).sum(axis=0, dtype=np.float32)
    flat = scores.reshape(-1)
    h1 = (prev_h1[:, None] + ah1[None, :]).reshape(-1)
    h2 = (prev_h2[:, None] + ah2[None, :]).reshape(-1)
    # lexsort: last key is primary -> (h1, h2, flat index) like the
    # device lax.sort(num_keys=3)
    order = np.lexsort((np.arange(T * A), h2, h1))
    sh1, sh2 = h1[order], h2[order]
    is_first = np.ones(T * A, bool)
    is_first[1:] = (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1])
    keep = np.zeros(T * A, bool)
    keep[order] = is_first
    masked = np.where(keep, flat, -np.inf)
    idx = np.argsort(-masked, kind="stable")[:k].astype(np.int32)
    new_prob = np.maximum(prev_prob[:, idx // A], log_probs[:, idx % A])
    return masked[idx], idx, new_prob


def fractionOfReadsHost(
    log_probs: np.ndarray, ids: np.ndarray, top_prob: np.ndarray
) -> np.ndarray:
    sel = log_probs[:, ids]
    belong = (sel == top_prob[:, :, None]).astype(np.float32)
    belong /= belong.sum(axis=2, keepdims=True)
    return belong.sum(axis=0) / log_probs.shape[0]


@partial(jax.jit, static_argnames=("k",))
def beamExtend(
    log_probs: jax.Array,   # [R, A] (already column-selected)
    prev_prob: jax.Array,   # [R, T]
    prev_h1: jax.Array,     # [T] uint32 commutative multiset hash
    prev_h2: jax.Array,     # [T] uint32 (independent second hash)
    ah1: jax.Array,         # [A] uint32 per-allele hash
    ah2: jax.Array,         # [A] uint32
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One beam-search CN step fully on device: score all T*A set
    extensions, drop duplicate multisets (commutative two-hash dedup,
    first flat occurrence kept), take the top k, and produce the kept
    sets' per-read best vector.

    Returns (value [k] f32 desc, flat_idx [k] i32 with t = idx // A and
    a = idx % A, new_prob [R, k]).  Masked/duplicate slots carry -inf.
    Only the two [k] vectors need downloading per step — prev/new prob
    matrices stay device-resident across the whole beam.
    """
    R, A = log_probs.shape
    T = prev_prob.shape[1]
    scores = pairMaxScores(log_probs, prev_prob)              # [T, A]
    flat = scores.reshape(-1)
    h1 = (prev_h1[:, None] + ah1[None, :]).reshape(-1)
    h2 = (prev_h2[:, None] + ah2[None, :]).reshape(-1)
    idx0 = jnp.arange(T * A, dtype=jnp.int32)
    sh1, sh2, sidx = jax.lax.sort((h1, h2, idx0), num_keys=3)
    is_first = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (sh1[1:] != sh1[:-1]) | (sh2[1:] != sh2[:-1]),
        ]
    )
    keep = jnp.zeros(T * A, bool).at[sidx].set(is_first)
    masked = jnp.where(keep, flat, -jnp.inf)
    value, idx = jax.lax.top_k(masked, k)
    t_sel = idx // A
    a_sel = idx % A
    new_prob = jnp.maximum(prev_prob[:, t_sel], log_probs[:, a_sel])
    return value, idx, new_prob
