#!/usr/bin/env python
"""Phase attribution of the fused device-annotate chunk: mono, kernel
(sub-variants), downloads, host assembly."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np

from bench import buildWorld, simulateBatch


def sync(x):
    jax.block_until_ready(x)
    return x


def main():
    print(f"devices: {jax.devices()}", flush=True)
    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    n_pairs = 2000 if os.environ.get("BENCH_SMALL") else 30000
    c1, l1, c2, l2 = simulateBatch(genes, index, n_pairs)

    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.device_annotate import DeviceAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner

    aligner = GraphAligner(index)
    ann = VariantAnnotator(index)
    da = DeviceAnnotator(aligner, ann)
    assert da.ok

    # warm everything
    out = da.annotateChunk(c1, l1, c2, l2)
    assert out is not None

    RL = aligner.p.read_len
    from kir_graph_tpu.align.pipeline import _uniformLen
    UL = _uniformLen(l1, l2)  # production passes this (device_annotate.py
    # dispatchChunk); without it the kernel compiles the degraded
    # take_along_axis revcomp the product never runs
    buf, N0, N = da._packChunk(c1, l1, c2, l2)
    buf_dev = sync(jnp.asarray(buf))
    t0 = time.time(); w_dev = sync(aligner._device_mono(buf_dev, RL, UL))
    t_mono = time.time() - t0
    t0 = time.time(); w = np.asarray(w_dev)
    t_wdl = time.time() - t0
    hard = da.hardRows(w)
    Hb = da._hardBucket(len(hard))
    hard_rows = np.full(Hb, -1, np.int32)
    hard_rows[:len(hard)] = hard
    hr_dev = sync(jnp.asarray(hard_rows))
    for _ in range(2):
        t0 = time.time()
        out_dev, pileup, depth = da._kernel(buf_dev, w_dev, hr_dev, RL, Hb, uniform_len=UL)
        sync(out_dev); sync(pileup)
        t_kern = time.time() - t0
    t0 = time.time(); out_np = np.asarray(out_dev)
    t_odl = time.time() - t0
    t0 = time.time(); ev = da._assemble(w, out_np, N0, N)
    t_asm = time.time() - t0
    print(f"N={N0} hard={len(hard)} Hb={Hb} out_bytes={out_np.nbytes}")
    print(f"mono          {t_mono*1e3:8.1f} ms")
    print(f"winners dl    {t_wdl*1e3:8.1f} ms")
    print(f"kernel        {t_kern*1e3:8.1f} ms")
    print(f"evidence dl   {t_odl*1e3:8.1f} ms")
    print(f"assemble      {t_asm*1e3:8.1f} ms")

    # staged prefixes of the kernel (static `stage` early returns)
    for stage in (21, 22, 1, 2, 3, 4, 5):
        r = da._kernel(buf_dev, w_dev, hr_dev, RL, Hb, stage, uniform_len=UL)
        sync(r)
        t0 = time.time()
        sync(da._kernel(buf_dev, w_dev, hr_dev, RL, Hb, stage, uniform_len=UL))
        print(f"stage<={stage}    {(time.time()-t0)*1e3:8.1f} ms")

    # kernel sub-variant: traceback-only cost (same Hb) vs full
    from kir_graph_tpu.align.dp import bandedTraceback, _gatherWindowsPacked
    from kir_graph_tpu.align.pipeline import PAD_L, _prepStreams

    p = aligner.p

    @jax.jit
    def tb_only(buf, w, hr):
        codes_all, _, lens_all = _prepStreams(buf, RL)
        Nn = buf.shape[0] // 2
        by = w[5:9].astype(jnp.int32) & 0xFFFF
        g_ps = jnp.stack([w[0], w[1]], 1).reshape(-1).astype(jnp.int32)
        from kir_graph_tpu.align.seeding import DIAG_BUCKET
        w0 = jnp.stack([w[2], w[3]], 1).reshape(-1).astype(jnp.int32) * DIAG_BUCKET - DIAG_BUCKET
        isrc = jnp.stack([by[0] & 0xFF, by[0] >> 8], 1).reshape(-1)
        lens_m = jnp.stack([lens_all[:Nn], lens_all[Nn:]], 1).reshape(-1).astype(jnp.int32)
        pair = jnp.arange(Nn, dtype=jnp.int32)
        rows_sel = jnp.stack([isrc[0::2] * Nn + pair, (2 + isrc[1::2]) * Nn + pair], 1).reshape(-1)
        bases = codes_all[rows_sel]
        hsafe = jnp.clip(hr, 0)
        wb, wa, wd = _gatherWindowsPacked(
            aligner._backbone, aligner._altdel, jnp.clip(g_ps[hsafe], 0),
            w0[hsafe], PAD_L, p.window, p)
        _, h_cols = bandedTraceback(wb, wa, wd, bases[hsafe],
                                    jnp.where(hr >= 0, lens_m[hsafe], 1), p)
        return h_cols.sum()

    sync(tb_only(buf_dev, w_dev, hr_dev))
    t0 = time.time(); sync(tb_only(buf_dev, w_dev, hr_dev))
    print(f"tb-only       {(time.time()-t0)*1e3:8.1f} ms (Hb={Hb})")


if __name__ == "__main__":
    main()
