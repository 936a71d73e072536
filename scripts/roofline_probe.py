#!/usr/bin/env python
"""Microbenchmarks of the primitive ops the exact path is built from,
against the chip's rooflines — sizes the device-annotate kernel before
building it and backs docs/ROOFLINE.md.

Each probe reports achieved element/s (or bytes/s) for the shapes the
product path actually uses (32k-pair chunk, RL=160 padded, 15-gene
KIR-scale index).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(iters):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.Generator(np.random.Philox(1))
    M, RL, W = 65536, 160, 208
    G, Lmax = 15, 12608
    V = 4608

    rows = []

    # 1. contiguous row gather: win[rowid] -> [M, W] u8 (seed/score layout)
    table = jnp.asarray(rng.integers(0, 255, (G * 256, W), dtype=np.uint8))
    rowid = jnp.asarray(rng.integers(0, G * 256, M, dtype=np.int32))
    t = timeit(jax.jit(lambda t_, r: t_[r]), table, rowid)
    rows.append(("row gather [M,W] u8", M * W, t))

    # 2. per-element 2D table gather: seq[g, col] -> [M, RL] i8
    seq = jnp.asarray(rng.integers(0, 4, (G, Lmax), dtype=np.int8))
    g = jnp.asarray(rng.integers(0, G, M, dtype=np.int32))
    cols = jnp.asarray(
        (rng.integers(0, Lmax - RL, M)[:, None] + np.arange(RL)[None, :])
        .astype(np.int32)
    )
    t = timeit(jax.jit(lambda s, g_, c: s[g_[:, None], c]), seq, g, cols)
    rows.append(("elem gather seq[g,col] [M,RL] i8", M * RL, t))

    # 3. big-table gather: snp_lookup[g, col, base] -> [M, RL] i32
    snp = jnp.asarray(rng.integers(-1, V, (G, Lmax, 4), dtype=np.int32))
    base = jnp.asarray(rng.integers(0, 4, (M, RL), dtype=np.int8))
    t = timeit(
        jax.jit(lambda s, g_, c, b: s[g_[:, None], c, b.astype(jnp.int32)]),
        snp, g, cols, base,
    )
    rows.append(("elem gather snp[g,col,b] [M,RL] i32", M * RL, t))

    # 4. take_along_axis within rows: [M, W] u8 rows, [M, RL] idx
    winrows = jnp.asarray(rng.integers(0, 255, (M, W), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, W, (M, RL), dtype=np.int32))
    t = timeit(
        jax.jit(lambda w, i: jnp.take_along_axis(w, i, axis=1)), winrows, idx
    )
    rows.append(("take_along rows [M,W]->[M,RL] u8", M * RL, t))

    # 5. flat cumsum (compaction prefix): [M*RL] i32
    flags = jnp.asarray(rng.integers(0, 2, M * RL, dtype=np.int32))
    t = timeit(jax.jit(jnp.cumsum), flags)
    rows.append(("flat cumsum [M*RL] i32", M * RL, t))

    # 6. scatter-add pileup: [M*RL] lin indices into [G*Lmax*5]
    lin = jnp.asarray(
        rng.integers(0, G * Lmax * 5, M * RL, dtype=np.int32)
    )
    def pile(l):
        return jnp.zeros(G * Lmax * 5, jnp.int32).at[l].add(1)
    t = timeit(jax.jit(pile), lin)
    rows.append(("scatter-add [M*RL] -> [G*L*5]", M * RL, t))

    # 7. compaction scatter: values to cumsum slots, cap 1<<20
    vals = jnp.asarray(rng.integers(0, V, M * RL, dtype=np.int32))
    def compact(f, v):
        slot = jnp.cumsum(f) - 1
        cap = 1 << 20
        idx = jnp.where((f > 0) & (slot < cap), slot, cap)
        return jnp.zeros(cap + 1, jnp.int32).at[idx].set(v)
    t = timeit(jax.jit(compact), flags, vals)
    rows.append(("cumsum+scatter compact [M*RL]", M * RL, t))

    # 8. cummax along rows [M, RL] i32 (deletion-run prev column)
    cm = jnp.asarray(rng.integers(0, Lmax, (M, RL), dtype=np.int32))
    t = timeit(jax.jit(lambda x: jax.lax.cummax(x, axis=1)), cm)
    rows.append(("cummax rows [M,RL] i32", M * RL, t))

    # 9. HBM stream reference: elementwise add [M, RL] i32
    t = timeit(jax.jit(lambda x: x + 1), cm)
    rows.append(("elementwise add [M,RL] i32 (stream ref)", M * RL, t))

    print(f"{'probe':45s} {'ms':>8s} {'Melem/s':>10s}")
    for name, n, t in rows:
        print(f"{name:45s} {t*1e3:8.2f} {n/t/1e6:10.0f}")


if __name__ == "__main__":
    main()
