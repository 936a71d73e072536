#!/usr/bin/env python
"""Microbenchmarks of the primitive ops the exact path is built from,
against the chip's rooflines — backs docs/ROOFLINE.md.

Timing methodology (the first version of this probe produced absurd
numbers on the tunneled axon platform — sub-0.1 ms for 10M-element
gathers — because a plain dispatch+block_until_ready loop measures the
RPC pipeline, not the device):

* each probe runs inside ONE jitted ``lax.fori_loop`` whose carry
  perturbs the op's indices/inputs every iteration (no CSE/hoisting)
  and consumes the full output through a reduction (no DCE);
* the loop is timed at two iteration counts and the per-iteration cost
  is the SLOPE — fixed costs (tunnel RTT, dispatch, the final scalar
  download) cancel exactly.

Shapes are the product path's: 32k-pair chunk (M=65536 reads), RL=160
padded, 15-gene KIR-scale index.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

K_LO = 8


def slopeTime(body, reps=5):
    """body(c:int32)->int32 runs under fori_loop; returns s/iteration.

    The iteration-count delta is calibrated so the k_hi-k_lo time gap is
    ~0.5 s — far above the tunnel's RTT jitter (several ms), which would
    otherwise swamp the slope for cheap ops.  The slope is the MEDIAN of
    the reps (min of a noisy difference biases toward negative noise).
    """

    @jax.jit
    def run(k):
        return lax.fori_loop(0, k, lambda i, c: body(c), jnp.int32(1))

    jax.block_until_ready(run(K_LO))  # compile
    t0 = time.time()
    jax.block_until_ready(run(K_LO))
    t8 = time.time() - t0  # fixed costs + K_LO iterations (upper bound)
    per_est = max(t8 / K_LO, 2e-6)
    k_hi = K_LO + int(min(max(16, 0.5 / per_est), 8192))
    jax.block_until_ready(run(k_hi))  # warm (k is a traced while bound)
    slopes = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(run(K_LO))
        t_lo = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(run(k_hi))
        t_hi = time.time() - t0
        slopes.append((t_hi - t_lo) / (k_hi - K_LO))
    return max(float(np.median(slopes)), 1e-9)


def consume(out):
    """Full-output reduction -> int32 carry (forces materialisation)."""
    return (jnp.sum(out, dtype=jnp.int32) & 0xFFFF) + 1


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.Generator(np.random.Philox(1))
    M, RL, W = 65536, 160, 208
    G, Lmax = 15, 12608
    V = 4608

    rows = []

    def probe(name, n_elem, body):
        t = slopeTime(body)
        rows.append((name, n_elem, t))
        print(
            f"{name:45s} {t*1e3:8.2f} ms {n_elem/t/1e6:10.0f} Melem/s",
            flush=True,
        )

    # 0. reduction baseline (the consume() cost inside every probe)
    base = jnp.asarray(rng.integers(0, 100, (M, RL), dtype=np.int32))
    probe("reduce-only baseline [M,RL] i32", M * RL,
          lambda c: consume(base + c))

    # 1. contiguous row gather: win[rowid] -> [M, W] u8 (seed/score layout)
    table = jnp.asarray(rng.integers(0, 255, (G * 256, W), dtype=np.uint8))
    rowid = jnp.asarray(rng.integers(0, G * 256, M, dtype=np.int32))
    probe("row gather [M,W] u8", M * W,
          lambda c: consume(table[(rowid + c) % (G * 256)]))

    # 2. per-element 2D table gather: seq[g, col] -> [M, RL] i8
    seq = jnp.asarray(rng.integers(0, 4, (G, Lmax), dtype=np.int8))
    g = jnp.asarray(rng.integers(0, G, M, dtype=np.int32))
    cols = jnp.asarray(
        (rng.integers(0, Lmax - RL, M)[:, None] + np.arange(RL)[None, :])
        .astype(np.int32)
    )
    probe("elem gather seq[g,col] [M,RL] i8", M * RL,
          lambda c: consume(seq[g[:, None], (cols + c) % Lmax]))

    # 2b. same gather, flattened to 1-D linear indices (device-annotate fix)
    seq_flat = seq.reshape(-1)
    lin2 = (g[:, None] * Lmax + cols).astype(jnp.int32)
    probe("flat gather seqflat[lin] [M,RL] i8", M * RL,
          lambda c: consume(seq_flat[(lin2 + c) % (G * Lmax)]))

    # 3. big-table gather: snp_lookup[g, col, base] -> [M, RL] i32
    snp = jnp.asarray(rng.integers(-1, V, (G, Lmax, 4), dtype=np.int32))
    base3 = jnp.asarray(rng.integers(0, 4, (M, RL), dtype=np.int32))
    snp_flat = snp.reshape(-1)
    lin3 = (g[:, None] * (Lmax * 4) + cols * 4 + base3).astype(jnp.int32)
    probe("flat gather snp[lin] [M,RL] i32", M * RL,
          lambda c: consume(snp_flat[(lin3 + c) % (G * Lmax * 4)]))

    # 4. take_along_axis within rows: [M, W] u8 rows, [M, RL] idx
    winrows = jnp.asarray(rng.integers(0, 255, (M, W), dtype=np.uint8))
    idx = jnp.asarray(rng.integers(0, W, (M, RL), dtype=np.int32))
    probe("take_along rows [M,W]->[M,RL] u8", M * RL,
          lambda c: consume(jnp.take_along_axis(winrows, (idx + c) % W,
                                                axis=1)))

    # 5. flat cumsum (compaction prefix): [M*RL] i32
    flags = jnp.asarray(rng.integers(0, 2, M * RL, dtype=np.int32))
    probe("flat cumsum [M*RL] i32", M * RL,
          lambda c: consume(jnp.cumsum(flags + (c & 1))))

    # 6. scatter-add pileup: [M*RL] lin indices into [G*Lmax*5]
    lin = jnp.asarray(rng.integers(0, G * Lmax * 5, M * RL, dtype=np.int32))
    probe("scatter-add [M*RL] -> [G*L*5]", M * RL,
          lambda c: consume(jnp.zeros(G * Lmax * 5, jnp.int32)
                            .at[(lin + c) % (G * Lmax * 5)].add(1)))

    # 7. compaction scatter: values to cumsum slots, cap 1<<20, drop mode
    vals = jnp.asarray(rng.integers(0, V, M * RL, dtype=np.int32))

    def compact(c):
        f = (flags + (c & 1)) & 1  # flips with the carry: no hoisting
        slot = jnp.cumsum(f) - 1
        cap = 1 << 20
        ix = jnp.where((f > 0) & (slot < cap), slot, cap + 1)
        out = jnp.zeros(cap + 1, jnp.int32).at[ix].set(
            vals + c, mode="drop")
        return consume(out)

    probe("cumsum+scatter compact [M*RL]", M * RL, compact)

    # 8. cummax along rows [M, RL] i32 (deletion-run prev column)
    cm = jnp.asarray(rng.integers(0, Lmax, (M, RL), dtype=np.int32))
    probe("cummax rows [M,RL] i32", M * RL,
          lambda c: consume(lax.cummax(cm + c, axis=1)))

    # 9. HBM stream reference: elementwise add [M, RL] i32
    probe("elementwise add [M,RL] i32 (stream ref)", M * RL,
          lambda c: consume(cm + c))

    # 10. the DP Pallas kernel at product shapes (J jobs, B=48, RL=160)
    try:
        from kir_graph_tpu.align.dp import AlignParams
        from kir_graph_tpu.ops.dp_pallas import (
            bandedScorePallasBytes, packWindowBytes, pallasAvailable,
        )

        if pallasAvailable():
            p = AlignParams()
            J = 2 * M  # two oriented jobs per read (product pairSelect grid)
            Wb = p.band + p.read_len + 16
            wbase = jnp.asarray(rng.integers(0, 4, (J, Wb), dtype=np.int8))
            walt = jnp.asarray(
                rng.integers(0, 16, (J, Wb), dtype=np.uint8))
            wdel = jnp.asarray(rng.integers(0, 2, (J, Wb), dtype=np.int8))
            wbytes = jax.jit(packWindowBytes)(wbase, walt, wdel)
            reads = jnp.asarray(
                rng.integers(0, 4, (J, p.read_len), dtype=np.int8))
            rlen = jnp.asarray(
                rng.integers(100, p.read_len, J, dtype=np.int32))

            def dpBody(c):
                cost, end, lin = bandedScorePallasBytes(
                    wbytes, (reads + c) % 5, rlen, p)
                return (consume(cost.astype(jnp.int32))
                        + consume(end) + consume(lin.astype(jnp.int32)))

            t = slopeTime(dpBody)
            cells = J * p.read_len * p.band
            rows.append((f"pallas DP J={J} B={p.band} RL={p.read_len}",
                         cells, t))
            print(f"{'pallas DP (cells)':45s} {t*1e3:8.2f} ms "
                  f"{cells/t/1e9:10.2f} Gcell/s", flush=True)
    except Exception as e:  # pragma: no cover
        print(f"pallas DP probe skipped: {e}", flush=True)

    out = {
        "device": str(jax.devices()[0]),
        "k_lo": K_LO,
        "probes": [
            {"name": n, "elements": e, "ms": round(t * 1e3, 3),
             "melem_per_s": round(e / t / 1e6)}
            for n, e, t in rows
        ],
    }
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "roofline_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
