"""
Benchmark: reads aligned per second per chip on a KIR-scale workload.

Workload shape mirrors the reference example cohort (SURVEY §6: 2 samples x
30,855 pairs x 2x150 bp against a 15-gene graph index): a synthetic
KIR-scale database (15 genes, ~12 kb backbones, catalogued SNPs+deletions)
and 30k simulated read pairs at 0.2% error.

Baseline: the reference aligns with 2-thread HISAT2 (graphkir/utils.py:60,
hisat2.py:68-92).  No hisat2 binary exists in this sandbox and there is no
network egress to obtain one, so the baseline cannot be measured here; the
constant below is a literature-derived engineering estimate — methodology,
sources and the sensitivity range are committed in docs/BASELINE_METHOD.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus both
paths' numbers: the pure-device cohort step (throughput path) and the exact
product path (alignPairs + variant annotation — the path that produces
`.variant.json`, depth, CN and allele calls).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

# honor JAX_PLATFORMS even when a site hook pre-imports jax and pins a
# remote platform (the env var alone is ignored once the plugin is
# registered; same workaround as pipeline/main.py entrypoint) — without
# this, `JAX_PLATFORMS=cpu python bench.py` hangs on an unreachable
# tunneled device instead of falling back to CPU
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialised: keep whatever it chose

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)

BENCH_DEGRADED = False


def _probePlatformAlive(timeout_s: float = 120.0) -> bool:
    """Init the default JAX backend in a THROWAWAY subprocess first: a
    dead tunneled device hangs jax.devices() forever, and once init
    starts in-process the platform can no longer be changed.  Returns
    False on timeout/failure so the caller can fall back to CPU."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _ensureLivePlatform() -> None:
    """Downgrade to CPU (with a visible flag in the output JSON) when
    the pinned remote platform is unreachable — a hung or crashed
    driver bench records nothing; a degraded CPU line records WHY.

    Driver runs always pin JAX_PLATFORMS (=axon here), so the probe
    must run even when the env var is set — only a pinned LOCAL
    platform (cpu) is trusted without probing.  Tunnel weather is
    transient, so a bounded retry window (default 3 probes spaced
    ~2 min, ≈10 min worst case) rides out blips before degrading.
    """
    global BENCH_DEGRADED
    if os.environ.get("BENCH_NO_PROBE"):
        return
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and plat.split(",")[0].strip() == "cpu":
        return  # local backend: nothing that can be "down"
    tries = int(os.environ.get("BENCH_PROBE_TRIES", "3"))
    wait_s = float(os.environ.get("BENCH_PROBE_WAIT_S", "120"))
    for i in range(max(tries, 1)):
        if _probePlatformAlive():
            return
        if i + 1 < tries:
            print(
                f"[bench] platform probe {i + 1}/{tries} failed; "
                f"retrying in {wait_s:.0f}s",
                file=sys.stderr, flush=True,
            )
            time.sleep(wait_s)
    print(
        "[bench] platform unreachable after "
        f"{tries} probes (device init timed out/failed); "
        "falling back to CPU — results will be flagged degraded",
        file=sys.stderr, flush=True,
    )
    try:
        jax.config.update("jax_platforms", "cpu")
        BENCH_DEGRADED = True
        # full-size CPU scan-DP takes tens of minutes: shrink so the
        # degraded line still lands within the driver's patience
        os.environ.setdefault("BENCH_SMALL", "1")
    except Exception:
        pass  # backend already up after all

BENCH_BAD_WEATHER = False


def _probeD2HBandwidth() -> float:
    """In-process device->host bandwidth (MB/s) on a 500 KB transfer.
    The tunnel's D2H swings 0.03..100 MB/s between windows; at the low
    end the full bench's ~30 MB of downloads would run for hours.  A
    small warmup transfer runs first: a fresh process's FIRST transfer
    pays a seconds-to-minutes connection penalty that is not steady-
    state bandwidth (measured round 5: 6 s for 100 KB, then 23 MB/s)."""
    import jax.numpy as jnp

    w = jnp.zeros(100_000, jnp.uint8) + jnp.uint8(1)
    jax.block_until_ready(w)
    np.asarray(w)  # connection warmup, untimed
    x = jnp.zeros(500_000, jnp.uint8) + jnp.uint8(2)
    jax.block_until_ready(x)
    t0 = time.time()
    np.asarray(x)
    return 0.5 / max(time.time() - t0, 1e-9)


def _ensureUsableWeather() -> None:
    """Shrink the workload (BENCH_SMALL) and flag the capture when the
    D2H link is in a dead window — a flagged small TPU line lands
    within the driver's patience; an unflagged full run would not."""
    global BENCH_BAD_WEATHER
    if os.environ.get("BENCH_NO_PROBE") or os.environ.get("BENCH_SMALL"):
        return
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and plat.split(",")[0].strip() == "cpu":
        return
    tries = int(os.environ.get("BENCH_PROBE_TRIES", "3"))
    wait_s = float(os.environ.get("BENCH_PROBE_WAIT_S", "120"))
    for i in range(max(tries, 1)):
        try:
            bw = _probeD2HBandwidth()
        except Exception:
            return  # platform probe already vetted init; don't double-fail
        if bw >= 1.0:
            log(f"[bench] D2H {bw:.1f} MB/s — weather OK")
            return
        log(f"[bench] D2H {bw:.2f} MB/s (dead window), "
            f"probe {i + 1}/{tries}")
        if i + 1 < tries:
            time.sleep(wait_s)
    log("[bench] link stuck in a dead window; shrinking to BENCH_SMALL "
        "and flagging the capture")
    os.environ["BENCH_SMALL"] = "1"
    BENCH_BAD_WEATHER = True


HISAT2_BASELINE_READS_PER_S = 1500.0  # 2-thread HISAT2 graph alignment
#   (estimate, unmeasurable in-sandbox — see docs/BASELINE_METHOD.md)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def buildWorld(small: bool):
    from kir_graph_tpu.index.build import buildIndexFromMsa
    from kir_graph_tpu.sim.synth_db import (
        SynthConfig,
        alleleUngappedSeq,
        makeSyntheticDB,
    )

    cfg = SynthConfig(
        n_genes=4 if small else 15,
        n_alleles_per_gene=8 if small else 40,
        gene_length=3000 if small else 12000,
        n_snp_sites=60 if small else 300,
        n_del_sites=3 if small else 6,
        n_families=4 if small else 8,
        seed=11,
    )
    t0 = time.time()
    genes = makeSyntheticDB(cfg)
    index = buildIndexFromMsa(genes)
    log(f"[bench] index build {time.time() - t0:.1f}s "
        f"({len(index.gene_names)} genes, {len(index.kmer_keys)} kmer keys)")
    return genes, index


def simulateBatch(genes, index, n_pairs: int, seed: int = 3):
    from kir_graph_tpu.align.encode import encodeReads
    from kir_graph_tpu.sim.reads import simulatePairedReads
    from kir_graph_tpu.sim.synth_db import alleleUngappedSeq

    rng = np.random.Generator(np.random.Philox(seed))
    seqs = {}
    for gname in index.gene_names:
        g = index.genes[gname]
        msa = genes[gname.split("*")[0]]
        for ai in rng.choice(len(g.alleles), size=2, replace=False):
            a = g.alleles[int(ai)]
            seqs[a] = alleleUngappedSeq(msa, a)
    total_len = sum(len(s) for s in seqs.values())
    depth = n_pairs * 300 / total_len
    sim = simulatePairedReads(seqs, depth=depth, seed=seed, error_rate=0.002)
    log(f"[bench] simulated {len(sim.r1)} pairs from {len(seqs)} alleles")
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return c1, l1, c2, l2


def main() -> None:
    _ensureLivePlatform()
    _ensureUsableWeather()

    import jax.numpy as jnp

    from kir_graph_tpu.align.encode import packCodes2bit
    from kir_graph_tpu.parallel.cohort import (
        buildDeviceArrays,
        cohortStep,
        revCompDevice,
        unpackCodes2bit,
    )

    small = bool(os.environ.get("BENCH_SMALL"))
    n_pairs = 2000 if small else 30000

    log(f"[bench] devices: {jax.devices()}")
    genes, index = buildWorld(small)
    arr = buildDeviceArrays(index)
    c1, l1, c2, l2 = simulateBatch(genes, index, n_pairs)
    RL = c1.shape[1]

    # device-resident alignment step: unpack + revcomp + seed + DP + pair
    # (downloads only scalars; device->host bandwidth is the bottleneck on
    # tunneled TPUs)
    from kir_graph_tpu.parallel.cohort import SplitCohortStep

    use_pallas = jax.default_backend() not in ("cpu",) and not os.environ.get(
        "BENCH_NO_PALLAS"
    )
    log(f"[bench] use_pallas={use_pallas}")

    @jax.jit
    def prep(packed, lens):
        u = unpackCodes2bit(packed, RL)
        return u, revCompDevice(u, lens)

    if not os.environ.get("BENCH_SPLIT"):
        # single-dispatch monolith (default): the whole chunk is ONE
        # jitted program — no inter-stage dispatch RTTs (~50ms each on
        # tunneled TPUs; measured +6% over the split driver).  Set
        # BENCH_SPLIT=1 for the 3-stage driver with per-stage timing.
        @jax.jit
        def mono(A, c1, l1, c2, l2, r1, r2):
            # A (DeviceIndexArrays pytree) is an argument, not a
            # closure: closed-over device arrays embed as MLIR
            # constants and every compile re-fetches them over the link
            return cohortStep(A, c1, l1, c2, l2, r1, r2,
                              axis_name=None, use_pallas=use_pallas)

        class _MonoStep:
            def __call__(self, c1, l1, c2, l2, r1, r2, timings=None):
                out = mono(arr, c1, l1, c2, l2, r1, r2)
                if timings is not None:
                    jax.block_until_ready(out)
                return out

        split = _MonoStep()
    else:
        split = SplitCohortStep(arr, use_pallas=use_pallas)
    timings: dict = {}

    # fixed-size chunks: few compiled shapes, reused for every chunk
    # (32k pairs/chunk: ~46ms dispatch RTT per stage call on tunneled TPUs,
    # so fewer+bigger dispatches win until HBM pressure)
    CHUNK = 2048 if small else 32768
    N = len(c1)
    n_pad = (-N) % CHUNK
    if n_pad:
        c1 = np.concatenate([c1, np.full((n_pad, RL), 4, np.int8)])
        c2 = np.concatenate([c2, np.full((n_pad, RL), 4, np.int8)])
        l1 = np.concatenate([l1, np.full(n_pad, 1, np.int32)])
        l2 = np.concatenate([l2, np.full(n_pad, 1, np.int32)])
    p1 = packCodes2bit(c1)
    p2 = packCodes2bit(c2)
    l1j, l2j = l1.astype(np.int32), l2.astype(np.int32)
    n_chunks = len(c1) // CHUNK

    def runAll(timed: bool = False):
        # chunk-invariant coverage: accumulate depth on device, count once
        depth_sum = None
        for i in range(n_chunks):
            s = i * CHUNK
            l1c = jnp.asarray(l1j[s : s + CHUNK])
            l2c = jnp.asarray(l2j[s : s + CHUNK])
            u1, r1 = prep(jnp.asarray(p1[s : s + CHUNK]), l1c)
            u2, r2 = prep(jnp.asarray(p2[s : s + CHUNK]), l2c)
            depth, hist, loglik = split(
                u1, l1c, u2, l2c, r1, r2, timings if timed else None
            )
            depth_sum = depth if depth_sum is None else depth_sum + depth
        return float((depth_sum > 0).sum())  # one scalar download; async

    t0 = time.time()
    try:
        runAll()
    except Exception as e:
        if not use_pallas:
            raise
        log(f"[bench] pallas path failed ({type(e).__name__}); falling back to XLA")
        split = SplitCohortStep(arr, use_pallas=False)
        runAll()
    log(f"[bench] warmup (compile) {time.time() - t0:.1f}s")
    timings.clear()

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        covered = runAll()
    dt = (time.time() - t0) / iters
    runAll(timed=True)  # one synced pass for the stage table
    n_reads = 2 * N
    reads_per_s = n_reads / dt
    log(
        f"[bench] device path: {n_reads} reads in {dt:.2f}s/iter "
        f"({reads_per_s:,.0f} reads/s, covered positions {covered:,.0f})"
    )
    if timings:  # split-stage mode only; the monolith is one dispatch
        log(f"[bench] stage seconds (one synced pass): "
            + ", ".join(f"{k}={v:.2f}" for k, v in sorted(timings.items())))

    # exact product path (annotation-grade output: the path that produces
    # .variant.json -> depth -> CN -> allele calls), measured by default
    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner

    from kir_graph_tpu.align.stream import alignAnnotateEvidence

    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)
    c1e, l1e = c1[:N], l1[:N]     # un-padded originals
    c2e, l2e = c2[:N], l2[:N]
    result = aligner.alignPairs(c1e, l1e, c2e, l2e)   # warm (compile)
    annotator.annotateEvidence(result)
    alignAnnotateEvidence(aligner, annotator, c1e, l1e, c2e, l2e)  # warm
    # The exact path ends at EvidenceArrays + depth + pileup: the array
    # contract every downstream product stage consumes (typing scatters
    # the CSRs straight into its count matrices, CN takes depth, the
    # .evidence.npz artifact is these arrays).  PairRead objects exist
    # only at the JSON/compat boundary; their materialisation cost is
    # reported separately below.
    # best-of-3: the tunneled device->host link's bandwidth swings ~50x
    # between runs (0.1..30+ MB/s); steady-state throughput of the
    # software is the minimum wall time, per-iteration times are logged
    exact_times = []
    for _ in range(3):
        t0 = time.time()
        ev, depth_e, pileup_e = alignAnnotateEvidence(
            aligner, annotator, c1e, l1e, c2e, l2e
        )
        jax.block_until_ready(depth_e)  # device-resident depth/pileup
        exact_times.append(time.time() - t0)
    dt_exact = min(exact_times)
    exact_reads_per_s = n_reads / dt_exact
    # align-only rate for the log line (the fused path has no separate
    # align step; this times the classic aligner on the same batch)
    t0 = time.time()
    result = aligner.alignPairs(c1e, l1e, c2e, l2e)
    dt_align = time.time() - t0
    t0 = time.time()
    reads_data = annotator.assembleReadsData(ev, depth_e, pileup_e)[0]
    dt_pairread = time.time() - t0
    log(
        f"[bench] exact path: {exact_reads_per_s:,.0f} reads/s "
        f"(align {n_reads / dt_align:,.0f} reads/s, "
        f"mapped {float((result.gene >= 0).mean()):.3f}, "
        f"passed {int(ev.pass_mask.sum())}, "
        f"evidence reads {len(reads_data['reads'])}, "
        f"pairread-compat materialise {dt_pairread:.2f}s, "
        f"iters {[round(t, 2) for t in exact_times]})"
    )

    # big-batch product path (pipeline/run.py): batches beyond one
    # 32768-pair chunk stream through align/stream.py — chunk k+1's
    # kernels overlap chunk k's host annotation, bit-identical output
    # (tests/test_stream.py).  4 chunks: cohort-scale steady state (the
    # first chunk's device phase has nothing to overlap, so short batches
    # under-report the pipeline's throughput).
    try:
        n_chunks = int(os.environ.get("BENCH_STREAM_CHUNKS", "4"))
    except ValueError as e:
        raise SystemExit(f"BENCH_STREAM_CHUNKS must be an integer: {e}")
    if n_chunks < 1:
        raise SystemExit(
            f"BENCH_STREAM_CHUNKS must be >= 1 (got {n_chunks})"
        )
    # small/smoke mode streams small chunks: n_chunks x CHUNK_PAIRS of
    # CPU scan-DP would run tens of minutes and prove nothing
    stream_chunk = 2048 if os.environ.get("BENCH_SMALL") \
        else GraphAligner.CHUNK_PAIRS
    n_big = n_chunks * stream_chunk
    reps = (n_big + N - 1) // N
    cb1 = np.concatenate([c1e] * reps)[:n_big]
    lb1 = np.concatenate([l1e] * reps)[:n_big]
    cb2 = np.concatenate([c2e] * reps)[:n_big]
    lb2 = np.concatenate([l2e] * reps)[:n_big]
    # one untimed pass first: the streamed driver compiles its own shapes
    # (prefetch/monolith buckets) — folding that 60-80s into iteration 1
    # would poison the median the JSON reports
    _, sdepth, _ = alignAnnotateEvidence(
        aligner, annotator, cb1, lb1, cb2, lb2, chunk=stream_chunk
    )
    jax.block_until_ready(sdepth)
    stream_times = []
    for _ in range(3):
        t0 = time.time()
        _, sdepth, _ = alignAnnotateEvidence(
            aligner, annotator, cb1, lb1, cb2, lb2,
            chunk=stream_chunk,
        )
        jax.block_until_ready(sdepth)
        stream_times.append(time.time() - t0)
    # median-of-3 with min/max recorded: the tunneled link's bandwidth
    # swings run to run, so the spread IS part of the result
    dt_stream = sorted(stream_times)[1]
    stream_reads_per_s = 2 * n_big / dt_stream
    stream_max = 2 * n_big / min(stream_times)
    stream_min = 2 * n_big / max(stream_times)
    log(
        f"[bench] exact path streamed ({n_big} pairs, {n_chunks} chunks): "
        f"median {stream_reads_per_s:,.0f} reads/s "
        f"[{stream_min:,.0f}..{stream_max:,.0f}] "
        f"(iters {[round(t, 2) for t in stream_times]})"
    )

    # product tail on the SAME sample's device outputs: depth -> CN ->
    # allele typing under each strategy (full AND the reference's real-WGS
    # default exonfirst, /root/reference/kir/graphkir.py:70-75, AND em) —
    # the production configuration's hot tail, timed per sample
    from kir_graph_tpu.cn.predict import depthToCN
    from kir_graph_tpu.typing.facade import selectKirTypingModel

    depth_np = np.asarray(depth_e)
    t0 = time.time()
    gene_depth = {
        gname: float(np.percentile(
            depth_np[gi, : int(index.lengths[gi])], 75
        ))
        for gi, gname in enumerate(index.gene_names)
    }
    try:
        cn_maps, _model = depthToCN(
            [gene_depth], assume_3DL3_diploid=not small
        )
        gene_cn = cn_maps[0]
    except Exception as e:  # CN fit is content-dependent; keep benching
        log(f"[bench] CN fit failed ({type(e).__name__}: {e}); "
            "typing with CN=2 everywhere")
        gene_cn = {g: 2 for g in index.gene_names}
    cn_s = time.time() - t0
    log(f"[bench] CN stage {cn_s:.2f}s "
        f"(cn counts: {sorted(set(gene_cn.values()))})")

    bundle = annotator.evidenceBundle(ev)
    typing_s: dict[str, float] = {}
    typing_calls: dict[str, int] = {}
    for method in ("full", "exonfirst_1", "em"):
        t0 = time.time()
        model = selectKirTypingModel(
            method, evidence=bundle, top_n=600, variant_correction=True
        )
        called, _warn = model.typing(gene_cn)
        key = method.split("_")[0]
        typing_s[key] = round(time.time() - t0, 3)
        typing_calls[key] = len(called)
        log(f"[bench] typing[{key}] {typing_s[key]:.2f}s "
            f"({len(called)} alleles called)")

    print(
        json.dumps(
            {
                # headline = the product path users actually run (FASTQ ->
                # evidence/depth, streamed, cohort steady state), median
                # of 3 same-session iterations
                "metric": "reads aligned/s/chip (exact product path, streamed)",
                "value": round(stream_reads_per_s, 1),
                "unit": "reads/s",
                "vs_baseline": round(
                    stream_reads_per_s / HISAT2_BASELINE_READS_PER_S, 2
                ),
                "exact_streamed_min_reads_per_s": round(stream_min, 1),
                "exact_streamed_max_reads_per_s": round(stream_max, 1),
                "exact_path_reads_per_s": round(exact_reads_per_s, 1),
                "exact_path_vs_baseline": round(
                    exact_reads_per_s / HISAT2_BASELINE_READS_PER_S, 2
                ),
                "device_step_reads_per_s": round(reads_per_s, 1),
                "pairread_compat_materialize_s": round(dt_pairread, 3),
                "cn_s_per_sample": round(cn_s, 3),
                "typing_s_per_sample": typing_s,
                "typing_alleles_called": typing_calls,
                "baseline_reads_per_s": HISAT2_BASELINE_READS_PER_S,
                "platform": jax.devices()[0].platform,
                **({"degraded": True} if BENCH_DEGRADED else {}),
                **(
                    {"degraded_weather": True} if BENCH_BAD_WEATHER else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
