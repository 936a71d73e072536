#!/usr/bin/env python
"""Same-session proof test: is the streamed product path link-bound?

Measures raw host->device and device->host bandwidth + dispatch RTT at
the streamed driver's actual transfer sizes, then runs one streamed
iteration in the SAME process (same tunnel weather) and compares:

    link_only_ms = upload_bytes/up_bw + download_bytes/down_bw + RTTs
    streamed_ms  = measured wall

If streamed_ms ~ link_only_ms the tunnel is the wall and further driver
work is pointless (VERDICT round-4 item 5); a large residual means the
software still owes time.
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

from bench import buildWorld, simulateBatch  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def measureLink(reps: int = 5):
    """(up_MBps, down_MBps, rtt_ms) at driver-representative sizes."""
    up_bytes = 5_500_000    # 2-bit packed 64k-pair chunk
    down_bytes = 1_800_000  # w [9,64k] i16 + pkx
    rng = np.random.default_rng(0)
    host_bufs = [
        rng.integers(0, 255, up_bytes, dtype=np.uint8) for _ in range(reps)
    ]
    # fresh computed device arrays per rep: np.asarray on an unchanged
    # array hits jax's host-copy cache and measures nothing
    base = jnp.zeros(down_bytes, jnp.uint8)
    jax.block_until_ready(base)
    downs_src = [base + jnp.uint8(i + 1) for i in range(reps)]
    jax.block_until_ready(downs_src)
    # RTT: scalar round trip
    tiny = jnp.zeros((), jnp.int32)
    jax.block_until_ready(tiny)
    rtts = []
    for i in range(reps):
        t0 = time.time()
        float(jnp.asarray(i, jnp.int32) + tiny)
        rtts.append(time.time() - t0)
    ups, downs = [], []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(jnp.asarray(host_bufs[i]))
        ups.append(time.time() - t0)
        t0 = time.time()
        np.asarray(downs_src[i])
        downs.append(time.time() - t0)
    rtt = float(np.median(rtts))
    up_bw = up_bytes / (float(np.median(ups)) - rtt + 1e-9) / 1e6
    down_bw = down_bytes / (float(np.median(downs)) - rtt + 1e-9) / 1e6
    log(f"[link] RTT {rtt * 1e3:.0f} ms  up {up_bw:.1f} MB/s "
        f"down {down_bw:.1f} MB/s  (median of {reps})")
    return up_bw, down_bw, rtt


def main():
    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner, tracebackLayout
    from kir_graph_tpu.align.stream import alignAnnotateEvidence

    genes, index = buildWorld(small=bool(os.environ.get("BENCH_SMALL")))
    c1, l1, c2, l2 = simulateBatch(genes, index, 30000)
    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    chunk = aligner.CHUNK_PAIRS
    n_chunks = 4
    n_big = n_chunks * chunk
    reps = (n_big + len(c1) - 1) // len(c1)
    cb1 = np.concatenate([c1] * reps)[:n_big]
    lb1 = np.concatenate([l1] * reps)[:n_big]
    cb2 = np.concatenate([c2] * reps)[:n_big]
    lb2 = np.concatenate([l2] * reps)[:n_big]

    # exact per-chunk byte budget
    RL = c1.shape[1]
    Wb = -(-RL // 4) + 2
    up_bytes = 2 * chunk * Wb + 4 * max(1024, chunk)  # buf2 + exc
    HB, mrows = tracebackLayout(chunk, RL)
    down_bytes = 9 * chunk * 2 + (HB + mrows) * (RL + 2)
    log(f"[link] per chunk: upload {up_bytes / 1e6:.2f} MB "
        f"download {down_bytes / 1e6:.2f} MB")

    # warm (compile) BEFORE probing so probe+measure share weather
    _, sd, _ = alignAnnotateEvidence(
        aligner, annotator, cb1, lb1, cb2, lb2, chunk=chunk
    )
    jax.block_until_ready(sd)

    up_bw, down_bw, rtt = measureLink()
    dispatches = 3  # monolith + 2 output copies share one queue round
    link_only = n_chunks * (
        up_bytes / (up_bw * 1e6) + down_bytes / (down_bw * 1e6)
        + dispatches * rtt
    )

    times = []
    for _ in range(3):
        t0 = time.time()
        _, sd, _ = alignAnnotateEvidence(
            aligner, annotator, cb1, lb1, cb2, lb2, chunk=chunk
        )
        jax.block_until_ready(sd)
        times.append(time.time() - t0)
    wall = sorted(times)[1]
    up_bw2, down_bw2, rtt2 = measureLink()  # weather drift check

    reads_per_s = 2 * n_big / wall
    log(f"[link] streamed wall {wall * 1e3:.0f} ms "
        f"({reads_per_s:,.0f} reads/s), link-only model "
        f"{link_only * 1e3:.0f} ms -> residual "
        f"{(wall - link_only) * 1e3:.0f} ms "
        f"({100 * (wall - link_only) / wall:.0f}% of wall)")
    print(
        {
            "wall_ms": round(wall * 1e3),
            "link_only_ms": round(link_only * 1e3),
            "residual_pct": round(100 * (wall - link_only) / wall),
            "up_MBps": [round(up_bw, 1), round(up_bw2, 1)],
            "down_MBps": [round(down_bw, 1), round(down_bw2, 1)],
            "rtt_ms": [round(rtt * 1e3), round(rtt2 * 1e3)],
            "reads_per_s": round(reads_per_s),
        }
    )


if __name__ == "__main__":
    main()
