"""
GraphAligner: the end-to-end read->placement engine.

Replaces the hisat2 subprocess + SAM round-trip (reference hisat2.py:68-92,
readPair/filterRead 228-276/541-578).  Per batch:

1. seed both mates in both orientations against the k-mer table
2. score every (read, orientation, gene, diagonal) candidate with the
   banded variant-aware DP (score-only pass)
3. pick concordant FR mate pairings per read, dedup placements by exact
   alignment end column, count NH (equal-best placements)
4. re-run the DP with pointers for the two winning jobs per pair and
   emit absolute traceback columns for the annotator
"""
from __future__ import annotations

import contextlib
import os
import threading
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import BASE_PAD, KirIndex
from ..utils import logger
from .dp import (
    AlignParams, bandedTracebackPacked, decodeDeltas, unpackTraceback,
)
from .encode import packCodes2bit, packCodes4bit, revCompCodes
from .seeding import DIAG_BUCKET, SeedTable

PAD_L = 64  # front padding of window coordinate space


def tracebackLayout(n_pairs: int, RL: int) -> tuple[int, int]:
    """Static layout of the fused-traceback download for an n_pairs
    chunk: (HB hard-job slots, mrows int8 rows holding the int32 meta).
    The device program (_buildDeviceMonoTb), the host decode and the
    tests all derive the split from here — change it in one place."""
    HB = max(512, n_pairs // 16)
    mrows = -(-(4 * (HB + 1)) // (RL + 2))
    return HB, mrows

# Fine-grained host-segment wall times, populated only when KGT_PROFILE
# is set (scripts/profile_host_path.py reads this to attribute the
# "host numpy/other" bucket).
SEG_TIMES: dict[str, float] = {}
_SEG_LOCK = threading.Lock()


@contextlib.contextmanager
def _seg(name: str):
    if not os.environ.get("KGT_PROFILE"):
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        # the threaded annotate runs _seg on worker AND main threads;
        # the read-modify-write must be atomic or profile time is lost
        dt = time.time() - t0
        with _SEG_LOCK:
            SEG_TIMES[name] = SEG_TIMES.get(name, 0.0) + dt


def _prepStreams(
    buf: jnp.ndarray,
    L: int,
    uniform_len: int | None = None,
    exc: jnp.ndarray | None = None,
):
    """Packed forward mates -> the aligner's 4-stream code pool
    [c1, rc1, c2, rc2] plus the 2-stream forward pool and the device
    lengths, all on device.

    Reads cross the (slow, tunneled) host->device link as ONE buffer:
    codes packed 2 per byte (`exc is None`, lossless nibbles) or 4 per
    byte plus an N-base exception list (`exc` = flat read*L+pos indices,
    -1 padded — the upload is the single largest link item, and true
    N bases are ~0.1% of Illumina bases, so shipping them as a side
    list halves the transfer), plus a 2-byte per-read length trailer
    (uploading lengths separately would cost a second per-transfer
    round-trip).  Unpack, pad-masking and reverse-complement happen on
    device in one fused dispatch.  Both layouts reconstruct identical
    code rows: N/pad code 4 survives, so scoring/N-exclusion semantics
    match an int8 upload bit-for-bit (tests/test_align.py)."""
    from ..parallel.cohort import revCompDevice, unpackCodes4bit

    lens = (
        buf[:, -2].astype(jnp.int32)
        | (buf[:, -1].astype(jnp.int32) << 8)
    )
    if exc is None:
        fwd = unpackCodes4bit(buf[:, :-2], L)
    else:
        b = buf[:, :-2]
        j = jnp.arange(L)
        byte = b[:, j // 4]
        shift = (2 * (j % 4)).astype(jnp.uint8)
        fwd = ((byte >> shift) & 3).astype(jnp.int8)
        # N positions packed as 0 (4 & 3) by the host: a scatter-ADD of
        # 4 restores code 4 exactly; -1 pad entries add 0 at (0, 0)
        ok = exc >= 0
        r = jnp.where(ok, exc // L, 0)
        c = jnp.where(ok, exc % L, 0)
        fwd = fwd.at[r, c].add(
            jnp.where(ok, jnp.int8(4), jnp.int8(0)), mode="drop"
        )
    col = jnp.arange(L)[None, :]
    fwd = jnp.where(col < lens[:, None], fwd, BASE_PAD).astype(jnp.int8)
    n = fwd.shape[0] // 2
    rc = revCompDevice(fwd, lens, uniform_len=uniform_len)
    codes_all = jnp.concatenate([fwd[:n], rc[:n], fwd[n:], rc[n:]], axis=0)
    return codes_all, fwd, lens


def _uniformLen(l1: np.ndarray, l2: np.ndarray) -> int | None:
    """The one read length shared by every real row, or None.

    Length-1 rows are the bucket-padding sentinel (all-PAD content,
    revcomp-rotation-immune — see revCompDevice); they don't break
    uniformity.  Returns None for genuinely mixed-length batches, which
    keep the exact per-row take_along_axis path."""
    u = np.unique(np.concatenate([l1, l2]))
    if u.size == 1:
        return int(u[0])
    if u.size == 2 and u[0] == 1:
        return int(u[1])
    return None


@dataclass
class AlignResult:
    """Per-pair winning placements (host arrays).

    The [N, RL] arrays may be views of the aligner's persistent scratch
    (fresh multi-MB allocations stall on ballooned hosts): they are valid
    until the NEXT alignPairs() call on the same GraphAligner.  Copy
    fields you need to keep across batches (the chunked >CHUNK_PAIRS path
    concatenates, i.e. copies, so its results are stable)."""

    gene: np.ndarray        # [N] int32, -1 = unmapped/discordant
    nh: np.ndarray          # [N] int32 number of equal-best placements
    cost: np.ndarray        # [N] f32 combined DP cost
    # winning mate orientations: True = mate stored reverse-complemented
    rc_l: np.ndarray        # [N] bool
    rc_r: np.ndarray
    cols_l: np.ndarray      # [N, RL] int32 absolute backbone column per base
    cols_r: np.ndarray      #            (-1 = past end, -2 = inserted base)
    bases_l: np.ndarray     # [N, RL] int8 oriented read codes
    bases_r: np.ndarray
    len_l: np.ndarray       # [N] int32
    len_r: np.ndarray


class GraphAligner:
    # Query-side seed sampling stride.  12 was accepted over the
    # original 8 with a measured bit-identity sweep (docs/BENCH_NOTES.md
    # round 4): pass masks, evidence, depth and pileup are identical on
    # the bench sim (0.2% err), hiseq-profile 0.8% and uniform 1.5%
    # batches; the only reads whose mapped-status changes are NM>4
    # fails the product filter drops regardless (k=24, min_votes=2: a
    # clean segment of k+2*stride-1 = 47 bases guarantees two sampled
    # seeds, vs 39 at stride 8 — both far under the ~60+ expected
    # longest clean run of an NM=4 read).  Seeding is ~40% of the device
    # monolith, so this is +30-37% streamed throughput.
    DEFAULT_STRIDE = 12

    def __init__(
        self,
        index: KirIndex,
        params: AlignParams | None = None,
        stride: int | None = None,
        top_c: int = 4,
        min_votes: int = 2,
        max_pair_buckets: int = 70,   # max mate diagonal distance in buckets
        use_pallas: bool | None = None,
        annot_editdist: int = 4,      # matches VariantAnnotator's NM filter
    ):
        self.index = index
        self.p = params or AlignParams()
        self.annot_editdist = annot_editdist
        if use_pallas is None:
            import jax

            from ..ops.dp_pallas import pallasAvailable

            use_pallas = pallasAvailable() and jax.default_backend() not in ("cpu",)
        self.use_pallas = use_pallas
        self.stride = self.DEFAULT_STRIDE if stride is None else stride
        self.top_c = top_c
        self.min_votes = min_votes
        self.max_pair_buckets = max_pair_buckets

        # shared device index arrays: the same seed table + per-(gene, diag)
        # window byte-plane the pure-device cohort path uses — scoring is a
        # contiguous row gather, not [J, W] per-element gathers
        from ..parallel.cohort import buildDeviceArrays

        self.arr = buildDeviceArrays(index, self.p)
        self.table = self.arr.table
        G, Lmax = index.backbone.shape
        self.Lmax = Lmax
        self._backbone = self.arr.backbone
        self._altdel = self.arr.altdel

        # pseudo-reference remap: rows >= G_true are spliced deletion
        # haplotypes; pairing/NH/dedup happen in TRUE gene coordinates
        G_true = len(index.gene_names)
        G_all = index.backbone.shape[0]
        row_true = np.arange(G_all, dtype=np.int32)
        row_pos = np.full(G_all, np.iinfo(np.int32).max, dtype=np.int64)
        row_len = np.zeros(G_all, dtype=np.int64)
        for pi, (tgi, pos, dlen) in enumerate(index.pseudo_refs):
            row_true[G_true + pi] = tgi
            row_pos[G_true + pi] = pos
            row_len[G_true + pi] = dlen
        self._row_true = row_true
        self._row_pos = row_pos
        self._row_len = row_len
        self._pair_select = self._buildPairSelect()
        self._device_mono = self._buildDeviceMonolith()
        self._device_mono_tb = self._buildDeviceMonoTb()

    def _buildDeviceMonolith(self):
        """ONE jitted dispatch for the whole pre-traceback device phase:
        upload-buffer decode -> canonical seeding -> candidate decode ->
        dense DP scoring -> pair select.  A tunneled device charges
        per-call latency on every dispatch; fusing the five stages also
        lets XLA share layouts across stage boundaries.  Returns the
        packed [9, N] winner array."""
        from functools import partial

        from ..parallel.cohort import decodeCandidates, scoreDenseGrid
        from .seeding import _findCandidates

        table, p = self.table, self.p
        md = table.max_diag
        C = self.top_c
        win = self.arr.win
        use_pallas = self.use_pallas
        stride = self.stride
        min_votes = self.min_votes
        n_genes = table.n_genes
        pair_select = self._pair_select

        def monoBody(merged, win_a, buf, RL, uniform_len=None, exc=None):
            # the index arrays (seed table + window byte-plane, tens of
            # MB) are ARGUMENTS, not closure captures: a closed-over
            # device array is embedded as an MLIR constant, which makes
            # EVERY per-bucket compile fetch it device->host during
            # lowering and re-ship it inside the HLO — minutes per
            # compile on a congested tunnel (measured round 5)
            codes_dev, codes_fwd, lens_dev = _prepStreams(
                buf, RL, uniform_len=uniform_len, exc=exc
            )
            N = codes_fwd.shape[0] // 2
            cand_d, _ = _findCandidates(
                codes_fwd, lens_dev, merged,
                table.k, stride, C, n_genes, md, min_votes,
            )
            gene_d, orient_d, diag_d = decodeCandidates(cand_d, md)
            cost_d, end_d, lin_d = scoreDenseGrid(
                win_a, md, p, codes_dev, lens_dev, gene_d, diag_d,
                orient=orient_d, use_pallas=use_pallas,
            )
            return pair_select(
                cost_d, gene_d, orient_d, diag_d, end_d, lin_d, lens_dev
            )

        def mono(buf, RL, uniform_len=None, exc=None):
            return monoBody(table.merged, win, buf, RL, uniform_len, exc)

        # unjitted closure body kept for the sharded exact path
        # (parallel/exact.py wraps it in shard_map over a device mesh)
        self._mono_fn = mono
        self._mono_body = monoBody
        jitted = partial(jax.jit, static_argnums=(3, 4))(monoBody)
        return lambda buf, RL, uniform_len=None, exc=None: jitted(
            table.merged, win, buf, RL, uniform_len, exc=exc
        )

    def _buildDeviceMonoTb(self):
        """Monolith + fused hard-job traceback: ONE dispatch computes the
        winners AND the pointer-DP delta streams for the gapped minority,
        so the host neither re-uploads the hard reads' codes nor pays a
        second dispatch round-trip per chunk — the traceback executes on
        device inside the same program, overlapping the caller's
        host_work window (docs/BENCH_NOTES.md round 4).

        Returns (w [9, N] i16 — as _device_mono, pkx i8) where pkx packs
        BOTH the hard-job metadata and the traceback rows into one array
        so the whole thing crosses the link in ONE transfer (each
        device->host fetch on a tunneled TPU costs a round-trip):
        rows [0, mrows) = int32 meta bitcast to bytes — HB compacted
        hard job rows (mate*N + pair, ascending: exactly
        np.nonzero(~easy)'s order over the host's mate-concatenated job
        arrays) followed by the true hard count; rows [mrows, mrows+HB)
        = bandedTracebackPacked rows, valid for the first count rows iff
        count <= HB (on overflow the host falls back to the dispatch
        path).  HB = max(512, pairs/16): the gapped share is ~2.5% of
        mate jobs on 30x Illumina (profile_device_annotate.py), 6.25%
        of pairs leaves headroom without bloating the download."""
        from functools import partial

        from .dp import bandedTracebackPacked

        mono_body = self._mono_body
        table, win = self.table, self.arr.win
        p = self.p

        def monoTb(merged, win_a, backbone, altdel, buf, RL,
                   uniform_len=None, exc=None):
            # index arrays ride as jit arguments — see monoBody
            w = mono_body(merged, win_a, buf, RL, uniform_len, exc=exc)
            N = buf.shape[0] // 2
            HB, mrows = tracebackLayout(N, RL)
            codes_all, _, lens_all = _prepStreams(
                buf, RL, uniform_len=uniform_len, exc=exc
            )
            # decode the packed winner rows (mirrors the host decode in
            # alignPairs) — g/d rows 0-3, byte-packed flags rows 5-8
            g = w[0:2].astype(jnp.int32)                       # [2, N]
            w0 = w[2:4].astype(jnp.int32) * DIAG_BUCKET - DIAG_BUCKET
            by = w[5:9].astype(jnp.int32) & 0xFFFF
            isrc = jnp.stack([by[0] & 0xFF, by[0] >> 8])       # [2, N]
            mapped = (by[2] >> 8) > 0
            easy = jnp.stack([by[3] & 0xFF, by[3] >> 8])
            hard = mapped[None, :] & (easy == 0)               # [2, N]

            # compact hard jobs to <= HB slots (mate-major order)
            flat = hard.reshape(-1)                            # [2N]
            slot = jnp.cumsum(flat) - 1
            tgt = jnp.where(flat & (slot < HB), slot, 1 << 30)
            jobrow = jnp.zeros(HB, jnp.int32).at[tgt].set(
                jnp.arange(2 * N, dtype=jnp.int32), mode="drop"
            )
            count = flat.sum().astype(jnp.int32)
            valid = jnp.arange(HB) < count
            mate = jobrow // N
            i = jobrow - mate * N
            hg = jnp.where(valid, jnp.clip(g.reshape(-1)[jobrow], 0), 0)
            hw0 = jnp.where(valid, w0.reshape(-1)[jobrow], 0)
            ho = isrc.reshape(-1)[jobrow]
            hcodes = codes_all[(2 * mate + ho) * N + i]
            hlens = jnp.where(valid, lens_all[mate * N + i], 1)
            pk = bandedTracebackPacked(
                backbone, altdel, hg, hw0, hcodes, hlens, p, PAD_L
            )
            meta = jnp.concatenate([jobrow, count[None]])
            mb = 4 * (HB + 1)
            meta_rows = jnp.pad(
                jax.lax.bitcast_convert_type(meta, jnp.int8).reshape(-1),
                (0, mrows * (RL + 2) - mb),
            ).reshape(mrows, RL + 2)
            return w, jnp.concatenate([meta_rows, pk], axis=0)

        backbone, altdel = self._backbone, self._altdel

        def monoTbClosure(buf, RL, uniform_len=None, exc=None):
            return monoTb(
                table.merged, win, backbone, altdel, buf, RL,
                uniform_len, exc=exc,
            )

        self._mono_tb_fn = monoTbClosure
        jitted = partial(jax.jit, static_argnums=(5, 6))(monoTb)
        return lambda buf, RL, uniform_len=None, exc=None: jitted(
            table.merged, win, backbone, altdel, buf, RL,
            uniform_len, exc=exc,
        )

    def _buildPairSelect(self):
        """Jitted concordant pairing + winner selection over the dense
        [4N, C] score grids — the host pairing loop moved on-device.
        Also decides the ungapped-traceback shortcut in-kernel (linear
        diagonal cost vs the DP optimum), so the host downloads just
        three small packed arrays (int16 + int8 + one f32 row): crucial
        on tunneled TPUs whose device->host link degrades to ~0.1 MB/s."""
        import jax

        C = self.top_c
        BIG = jnp.float32(1e9)
        row_true = jnp.asarray(self._row_true)
        # int32-safe remap tables (device default dtype): clamp the "no
        # pseudo split" sentinel below int32 max after the end-coordinate
        # shift math
        row_pos = jnp.asarray(
            np.minimum(self._row_pos, 2**30).astype(np.int32)
        )
        row_len = jnp.asarray(self._row_len.astype(np.int32))
        map_cap = jnp.float32(4.0 * (self.annot_editdist + 1))
        pair_span = jnp.int32(self.max_pair_buckets * DIAG_BUCKET)
        band = self.p.band
        assert band <= 128, "winner end offsets travel as int8"

        @jax.jit
        def pairSelect(cost_d, gene_d, orient_d, diag_d, end_d, lin_d,
                       lens_fwd):
            # mate-stacked [2N, C] candidate grids (canonical seeding:
            # per-candidate orientation)
            N = gene_d.shape[0] // 2
            end_raw = end_d.astype(jnp.int32)
            gsafe = jnp.clip(gene_d, 0, row_true.shape[0] - 1)
            g_end = end_raw + (end_raw >= row_pos[gsafe]) * row_len[gsafe]
            g_true = jnp.where(gene_d >= 0, row_true[gsafe], -1)

            m1_cost, m2_cost = cost_d[:N], cost_d[N:]
            m1_gene, m2_gene = g_true[:N], g_true[N:]
            m1_end, m2_end = g_end[:N], g_end[N:]
            m1_o, m2_o = orient_d[:N], orient_d[N:]

            pc = m1_cost[:, :, None] + m2_cost[:, None, :]
            valid = (
                (m1_gene[:, :, None] == m2_gene[:, None, :])
                & (m1_gene[:, :, None] >= 0)
                & (m1_o[:, :, None] != m2_o[:, None, :])   # FR pairing
                & (
                    jnp.abs(m1_end[:, :, None] - m2_end[:, None, :])
                    <= pair_span
                )
            )
            pair_cost = jnp.where(valid, pc, BIG)
            flat_pair = pair_cost.reshape(N, -1)
            best = flat_pair.min(axis=1)
            mapped = best < map_cap

            # NH: distinct (gene, end1, end2) among equal-best combos.
            # O(K^2) pairwise dedup (K = C*C) keeps everything int32.
            g_f = jnp.broadcast_to(
                m1_gene[:, :, None], pair_cost.shape
            ).reshape(N, -1)
            e1_f = jnp.broadcast_to(
                m1_end[:, :, None], pair_cost.shape
            ).reshape(N, -1)
            e2_f = jnp.broadcast_to(
                m2_end[:, None, :], pair_cost.shape
            ).reshape(N, -1)
            is_best = (flat_pair <= best[:, None] + 1e-4) & valid.reshape(N, -1)
            samepl = (
                (g_f[:, :, None] == g_f[:, None, :])
                & (e1_f[:, :, None] == e1_f[:, None, :])
                & (e2_f[:, :, None] == e2_f[:, None, :])
            )
            K = flat_pair.shape[1]
            earlier = jnp.tril(jnp.ones((K, K), bool), k=-1)
            dup = (
                samepl & earlier[None] & is_best[:, None, :]
            ).any(axis=2)
            nh = (is_best & ~dup).sum(axis=1).astype(jnp.int32)

            best_combo = jnp.argmin(flat_pair, axis=1).astype(jnp.int32)
            bc1 = best_combo // C
            bc2 = best_combo % C

            rows = jnp.arange(N)

            def winner(bc, mate, lens):
                g = gene_d[mate * N + rows, bc]
                d = diag_d[mate * N + rows, bc]
                w0 = d * DIAG_BUCKET - DIAG_BUCKET
                is_rc = orient_d[mate * N + rows, bc]
                dpc = cost_d[mate * N + rows, bc]
                eoff = jnp.clip(
                    end_raw[mate * N + rows, bc] - w0 - (lens - 1),
                    0, band - 1,
                )
                # ungapped shortcut decision: cost of the pure-diagonal
                # path at the winning end offset == DP optimum -> the
                # traceback is synthesizable on host from (w0, eoff).
                # The diagonal cost comes straight from the DP kernel
                # (lin_d), not a window re-gather.
                lin = lin_d[mate * N + rows, bc]
                easy = (lin <= dpc + 1e-4).astype(jnp.int8)
                return g, d, is_rc, eoff, easy

            g1, d1, isrc1, eoff1, easy1 = winner(bc1, 0, lens_fwd[:N])
            g2, d2, isrc2, eoff2, easy2 = winner(bc2, 1, lens_fwd[N:])

            # ONE packed [9, N] int16 download (the tunneled link charges
            # per-transfer latency, so three separate arrays cost three
            # round-trips): rows 0-3 = g1,g2,d1,d2; row 4 = best pair
            # cost as bitcast f16 (costs are small multiples of del_eps
            # = 1/64 — exactly representable); rows 5-8 = byte-packed
            # small fields lo|hi<<8 (all values in [0,127])
            def pack2(a, b):
                return (
                    a.astype(jnp.int32) | (b.astype(jnp.int32) << 8)
                ).astype(jnp.int16)

            return jnp.concatenate(
                [
                    jnp.stack([g1, g2, d1, d2]).astype(jnp.int16),
                    jax.lax.bitcast_convert_type(
                        best.astype(jnp.float16), jnp.int16
                    )[None, :],
                    jnp.stack(
                        [
                            pack2(isrc1, isrc2),
                            pack2(eoff1, eoff2),
                            pack2(jnp.clip(nh, 0, 127), mapped),
                            pack2(easy1, easy2),
                        ]
                    ),
                ],
                axis=0,
            )

        return pairSelect

    def _hostBuf(self, key: str, shape, dtype):
        """Persistent host scratch (pages stay faulted-in across batches;
        fresh large allocations stall for seconds on ballooned hosts).
        Keyed by thread id: concurrent per-sample chains may share one
        aligner."""
        import threading

        bufs = self.__dict__.setdefault("_host_bufs", {})
        n = int(np.prod(shape))
        k = (key, np.dtype(dtype).str, threading.get_ident())
        buf = bufs.get(k)
        if buf is None or buf.size < n:
            buf = np.empty(max(n, 1), dtype=dtype)
            bufs[k] = buf
        return buf[:n].reshape(shape)

    @staticmethod
    def _bucket(n: int, chunk: int) -> int:
        """Pad size bucketing: few distinct shapes -> few XLA compiles.
        4x growth up to 16k keeps the shape count tiny (compiles are
        expensive on a tunneled TPU), then 2x steps so common cohort
        sizes (e.g. the example's ~31k pairs) don't pad to a double-size
        chunk; at most half-of-step padding waste."""
        b = 256
        while b < n and b < chunk:
            b *= 4 if b < 16384 else 2
        return min(b, chunk)

    def _tracebackJobs(
        self, gene, w0, codes, lens, easy, end_off,
        dest_row, dest_which, dst0, dst1, chunk: int = 32768,
        device_hard=None,
    ):
        """Traceback columns for winner jobs, scattered into the
        per-mate column buffers.

        `easy` marks jobs whose optimal alignment is the pure-diagonal
        path at `end_off` (decided on-device in pairSelect): their
        columns are synthesized on host, and the pointer-DP traceback
        runs only for the gapped minority (reads spanning catalogued
        deletions or carrying novel indels).

        Job j's finalized columns (absolute backbone coords with the
        pseudo-ref junction shift applied, -1 pad / -2 insertion /
        -3 out-of-reference) are written to
        ``(dst1 if dest_which[j] else dst0)[dest_row[j]]``.  Native path:
        one threaded C call per group (native/annotate.cpp
        kgt_finalize_cols); numpy fallback mirrors it bit-for-bit."""
        from ..native_io import finalizeColsNative

        J = len(gene)
        RL = self.p.read_len
        glen_all = self._glenAll()
        row_pos, row_len = self._row_pos, self._row_len
        off = np.clip(end_off, 0, self.p.band - 1).astype(np.int32)

        def finalize(idx, start_col, delta, all_easy):
            """Finalize one job group (easy synthesis or decoded DP)."""
            n = len(idx)
            gi = np.ascontiguousarray(gene[idx].astype(np.int32))
            wi = np.ascontiguousarray(w0[idx].astype(np.int32))
            with _seg("finalize_cols"):
                done = finalizeColsNative(
                    np.full(n, 1 if all_easy else 0, np.uint8),
                    gi, wi,
                    np.ascontiguousarray(off[idx]),
                    np.ascontiguousarray(lens[idx].astype(np.int32)),
                    start_col, delta,
                    glen_all, row_pos, row_len,
                    np.ascontiguousarray(dest_row[idx].astype(np.int64)),
                    np.ascontiguousarray(dest_which[idx]),
                    dst0, dst1,
                )
            if done:
                return
            with _seg("finalize_cols_np"):
                if all_easy:
                    i = np.arange(RL, dtype=np.int32)[None, :]
                    abs_c = (wi + off[idx])[:, None].astype(np.int32) + i
                    consumed = i < lens[idx][:, None]
                    glen = glen_all[gi]
                    oor = consumed & ((abs_c < 0) | (abs_c >= glen[:, None]))
                    abs_c[oor] = -3
                    abs_c[~consumed] = -1
                else:
                    col = decodeDeltas(start_col, delta)
                    abs_c = np.where(col >= 0, col + wi[:, None], col)
                    # consumed bases outside the reference (read overhangs
                    # a gene boundary; window pad) -> -3 "out of reference"
                    # sentinel, so they can't collide with the -1/-2
                    # markers or index OOB
                    glen = glen_all[gi]
                    oor = (col >= 0) & ((abs_c < 0) | (abs_c >= glen[:, None]))
                    abs_c = np.where(oor, -3, abs_c).astype(np.int32)
                # pseudo-ref cols -> true backbone coords (the junction
                # then shows as a catalogued-deletion gap to the annotator)
                shift = ((abs_c >= row_pos[gi][:, None]) & (abs_c >= 0)) \
                    * row_len[gi][:, None]
                abs_c += shift.astype(np.int32)
                for which, dst in ((0, dst0), (1, dst1)):
                    m = dest_which[idx] == which
                    if m.any():
                        dst[dest_row[idx][m]] = abs_c[m]

        eidx = np.nonzero(easy)[0]
        if len(eidx):
            finalize(eidx, None, None, all_easy=True)
        hard = np.nonzero(~easy)[0]
        if device_hard is not None:
            # the fused monolith already ran the pointer DP for these
            # jobs; verify the device's compacted (mate*N + pair) rows
            # match this call's hard-job order exactly before trusting
            # the delta rows (a layout drift then falls back to the
            # dispatch path instead of mis-assigning tracebacks)
            jobrow, start_col, delta = device_hard
            N_rows = dst0.shape[0]
            expect = (
                dest_which[hard].astype(np.int64) * N_rows
                + dest_row[hard]
            )
            if len(jobrow) == len(hard) and np.array_equal(jobrow, expect):
                if len(hard):
                    finalize(hard, start_col, delta, all_easy=False)
                return
            logger.warning(
                "[Align] fused-traceback job order mismatch "
                f"({len(jobrow)} vs {len(hard)}); re-dispatching"
            )
        for s in range(0, len(hard), chunk):
            hi = hard[s : s + chunk]
            n = len(hi)
            pad = self._bucket(n, chunk) - n
            wg = np.concatenate([gene[hi], np.zeros(pad, dtype=gene.dtype)])
            ww = np.concatenate([w0[hi], np.zeros(pad, dtype=w0.dtype)])
            rc = np.concatenate(
                [codes[hi], np.full((pad, codes.shape[1]), BASE_PAD, np.int8)]
            )
            rl = np.concatenate([lens[hi], np.full(pad, 1, np.int32)])
            pk_d = bandedTracebackPacked(
                self._backbone, self._altdel,
                jnp.asarray(np.clip(wg, 0, None)), jnp.asarray(ww),
                jnp.asarray(rc), jnp.asarray(rl), self.p, PAD_L,
            )
            # download only the real rows (device-side slice), fused
            # into ONE transfer: the tunnel's device->host link charges
            # per-transfer latency on top of bandwidth
            start_col, delta = unpackTraceback(np.asarray(pk_d[:n]))
            finalize(hi, start_col, delta, all_easy=False)

    def _glenAll(self) -> np.ndarray:
        g = getattr(self, "_glen_all", None)
        if g is None:
            g = np.ascontiguousarray(
                np.asarray(self.index.lengths, dtype=np.int64)
            )
            self._glen_all = g
        return g

    # ------------------------------------------------------------------
    # fixed upper shape: big batches stream in chunks.  64k pairs/chunk
    # halves the per-chunk fixed costs (dispatch RTT, winner download,
    # annotate split) — measured +35% end-to-end on 2-chunk batches vs
    # 32k; the 2x bucket ladder below keeps ~31k-pair samples at a 32k
    # shape instead of padding into this.  Env-tunable for per-link
    # tuning (the fixed-cost/compute balance is a property of the
    # tunnel, not the algorithm).
    CHUNK_PAIRS = int(os.environ.get("KGT_CHUNK_PAIRS", "65536"))

    def _padToBucket(self, codes1, len1, codes2, len2):
        """Pad a <= CHUNK_PAIRS batch up to its shape bucket."""
        N0 = len(codes1)
        Nb = self._bucket(N0, self.CHUNK_PAIRS)
        if Nb > N0:
            pad = Nb - N0

            def padc(c):
                return np.concatenate(
                    [c, np.full((pad, c.shape[1]), BASE_PAD, np.int8)]
                )

            def padl(l):
                return np.concatenate([l, np.full(pad, 1, l.dtype)])

            codes1, codes2 = padc(codes1), padc(codes2)
            len1, len2 = padl(len1), padl(len2)
        return codes1, len1, codes2, len2, N0

    def _packUpload(self, codes1, len1, codes2, len2, buf_key="upload_buf"):
        """Fill the fused upload buffer (nibble-packed codes + length
        trailer) in persistent scratch -> (buf, l1c, l2c)."""
        from ..native_io import packUploadNative

        N = len(codes1)
        RL = self.p.read_len
        with _seg("pack_upload"):
            W = -(-RL // 2) + 2
            buf = self._hostBuf(buf_key, (2 * N, W), np.uint8)
            l1c = np.ascontiguousarray(len1, dtype=np.int32)
            l2c = np.ascontiguousarray(len2, dtype=np.int32)
            if not packUploadNative(
                np.ascontiguousarray(codes1, dtype=np.int8),
                np.ascontiguousarray(codes2, dtype=np.int8),
                l1c, l2c, buf,
            ):
                lens_fwd = np.concatenate([l1c, l2c])
                buf[:, :-2] = packCodes4bit(
                    np.concatenate([codes1, codes2], axis=0)
                )
                buf[:, -2] = (lens_fwd & 0xFF).astype(np.uint8)
                buf[:, -1] = (lens_fwd >> 8).astype(np.uint8)
        return buf, l1c, l2c

    def _packUpload2bit(
        self, codes1, len1, codes2, len2, buf_key="upload2_buf"
    ):
        """2-bit pack + N-base exception list -> (buf2, exc, l1c, l2c),
        or None when the in-length N count overflows the exception
        bucket (caller falls back to the lossless nibble layout).

        Halves the dominant host->device transfer (~10.7 MB -> ~5.5 MB
        per 64k-pair chunk on the tunneled link): bases ship 4 per byte
        with N (code 4) packed as 0, plus a flat read*RL+pos index list
        of the true N positions that a device scatter-ADD restores to
        code 4 exactly (_prepStreams).  The exception bucket is
        max(1024, pairs) entries — ~0.4% of bases at 64k chunks, >4x the
        Illumina N rate; its shape rides the pair bucket, so no extra
        monolith recompiles."""
        from ..native_io import packUpload2bitNative

        N = len(codes1)
        RL = self.p.read_len
        Wb = -(-RL // 4)
        # the exception list carries flat read*RL+pos indices in int32
        # (native AND numpy paths); a raised KGT_CHUNK_PAIRS can push
        # 2N*RL past int32 and silently wrap the scatter indices -> use
        # the lossless nibble layout instead
        if 2 * N * RL > np.iinfo(np.int32).max:
            return None
        with _seg("pack_upload"):
            l1c = np.ascontiguousarray(len1, dtype=np.int32)
            l2c = np.ascontiguousarray(len2, dtype=np.int32)
            c1 = np.ascontiguousarray(codes1, dtype=np.int8)
            c2 = np.ascontiguousarray(codes2, dtype=np.int8)
            EB = max(1024, N)
            exc = np.full(EB, -1, np.int32)
            buf = self._hostBuf(buf_key, (2 * N, Wb + 2), np.uint8)
            total = packUpload2bitNative(c1, c2, l1c, l2c, buf, exc)
            if total < 0:
                # portable fallback (no native lib): numpy pack + scan
                parts = []
                total = 0
                for half, (cc, ll) in enumerate(((c1, l1c), (c2, l2c))):
                    # >= 4 matches packCodes2bit's masking: any
                    # out-of-contract code > 4 packs as 0 and gets an
                    # exception entry, so it reconstructs as N (4)
                    # instead of silently becoming A
                    rows, cols = np.nonzero(cc >= 4)
                    keep = cols < ll[rows]
                    rows, cols = rows[keep], cols[keep]
                    total += len(rows)
                    if total > EB:
                        return None
                    parts.append(
                        ((rows.astype(np.int64) + half * N) * RL + cols)
                        .astype(np.int32)
                    )
                if total:
                    exc[:total] = np.concatenate(parts)
                buf[:N, :Wb] = packCodes2bit(c1)
                buf[N:, :Wb] = packCodes2bit(c2)
                lens_fwd = np.concatenate([l1c, l2c])
                buf[:, -2] = (lens_fwd & 0xFF).astype(np.uint8)
                buf[:, -1] = (lens_fwd >> 8).astype(np.uint8)
            elif total > EB:
                return None
        return buf, exc, l1c, l2c

    def _packAny(self, codes1, len1, codes2, len2, key_suffix=""):
        """Pack a chunk for upload: 2-bit + exceptions when enabled and
        the N count fits (KGT_UPLOAD_2BIT=0 disables), else nibbles.
        -> (buf, exc_or_None, l1c, l2c)."""
        if os.environ.get("KGT_UPLOAD_2BIT", "1") != "0":
            got = self._packUpload2bit(
                codes1, len1, codes2, len2,
                buf_key="upload2_buf" + key_suffix,
            )
            if got is not None:
                return got
        buf, l1c, l2c = self._packUpload(
            codes1, len1, codes2, len2, buf_key="upload_buf" + key_suffix
        )
        return buf, None, l1c, l2c

    def prepareUpload(self, codes1, len1, codes2, len2):
        """Pack + START uploading a (<= CHUNK_PAIRS) chunk ahead of its
        alignPairs call, so the host->device transfer (~40-70 MB/s on a
        tunneled TPU — 150+ ms per 64k chunk, measured on the critical
        path) streams while the PREVIOUS chunk's kernels execute.  Call
        from inside the previous alignPairs' host_work window; pass the
        returned handle as alignPairs(..., prepared=handle).

        Double-buffered scratch: the prefetch pack must never overwrite
        host memory whose upload may still be in flight."""
        assert len(codes1) <= self.CHUNK_PAIRS
        codes1, len1, codes2, len2, N0 = self._padToBucket(
            codes1, len1, codes2, len2
        )
        # per-thread toggle: _hostBuf scratch is thread-keyed (concurrent
        # per-sample chains may share one aligner), so the double-buffer
        # cursor must be too — a shared cursor could hand one thread the
        # same buffer twice in a row while its first upload is in flight
        toggles = self.__dict__.setdefault("_pf_toggles", {})
        tid = threading.get_ident()
        toggle = toggles.get(tid, 0)
        toggles[tid] = 1 - toggle
        buf, exc, l1c, l2c = self._packAny(
            codes1, len1, codes2, len2, key_suffix=f"_pf{toggle}"
        )
        return {
            "buf_dev": jnp.asarray(buf),
            "exc_dev": None if exc is None else jnp.asarray(exc),
            "buf_shape": buf.shape,
            "codes1": codes1, "len1": len1,
            "codes2": codes2, "len2": len2,
            "l1c": l1c, "l2c": l2c, "n0": N0,
        }

    @staticmethod
    def _trimResult(result: "AlignResult", n0: int) -> "AlignResult":
        """Slice every field of a bucket-padded result back to n0 rows."""
        return AlignResult(
            **{
                k: getattr(result, k)[:n0]
                for k in AlignResult.__dataclass_fields__
            }
        )

    def alignPairs(
        self,
        codes1: np.ndarray,
        len1: np.ndarray,
        codes2: np.ndarray,
        len2: np.ndarray,
        host_work=None,
        prepared=None,
        host_join=None,
    ) -> AlignResult:
        """Align mate pairs.  `host_work`, when given, is invoked once at
        the point where this batch's seed/score/pair-select kernels have
        been dispatched but nothing has been downloaded yet — pure host
        work runs there concurrently with the device kernels (the
        streaming driver in align/stream.py annotates the previous chunk
        in that window).  host_work must not touch this aligner's
        persistent scratch buffers' current contents (the previous
        AlignResult views are still safe: scratch writes happen after
        host_work returns).  `host_join`, when given, is invoked after
        this batch's blocking downloads but BEFORE any scratch write —
        the last point where background work started in host_work may
        still be reading the previous AlignResult's views (the stream
        driver joins its threaded annotate there).  `prepared` is a
        prepareUpload() handle for THIS chunk: the upload is already in
        flight and the packed host arrays inside it are used verbatim."""
        if prepared is not None:
            return self.finishPairs(
                self.dispatchPairs(
                    codes1, len1, codes2, len2, prepared=prepared
                ),
                host_work=host_work, host_join=host_join,
            )
        N0 = len(codes1)
        if N0 > self.CHUNK_PAIRS:
            # copy each chunk's fields BEFORE the next chunk runs: chunk
            # results are views of the aligner's persistent scratch and
            # the next call overwrites them.  Each chunk's host_work
            # window prefetches the NEXT chunk's upload (same overlap
            # the stream driver uses — the transfer is the critical-path
            # item on a tunneled link).
            out: dict[str, np.ndarray] = {}
            prefetched: dict[int, dict] = {}
            for s in range(0, N0, self.CHUNK_PAIRS):
                nxt = s + self.CHUNK_PAIRS

                def chunkWork(s=s, nxt=nxt):
                    if nxt < N0:
                        prefetched[nxt] = self.prepareUpload(
                            codes1[nxt : nxt + self.CHUNK_PAIRS],
                            len1[nxt : nxt + self.CHUNK_PAIRS],
                            codes2[nxt : nxt + self.CHUNK_PAIRS],
                            len2[nxt : nxt + self.CHUNK_PAIRS],
                        )
                    if s == 0 and host_work is not None:
                        host_work()

                part = self.alignPairs(
                    codes1[s : s + self.CHUNK_PAIRS],
                    len1[s : s + self.CHUNK_PAIRS],
                    codes2[s : s + self.CHUNK_PAIRS],
                    len2[s : s + self.CHUNK_PAIRS],
                    host_work=chunkWork,
                    prepared=prefetched.pop(s, None),
                    host_join=host_join if s == 0 else None,
                )
                for k in AlignResult.__dataclass_fields__:
                    v = getattr(part, k)
                    if k not in out:
                        out[k] = np.empty((N0,) + v.shape[1:], v.dtype)
                    out[k][s : s + len(v)] = v
            return AlignResult(**out)
        return self.finishPairs(
            self.dispatchPairs(codes1, len1, codes2, len2),
            host_work=host_work, host_join=host_join,
        )

    def dispatchPairs(
        self, codes1, len1, codes2, len2, prepared=None
    ) -> dict:
        """Dispatch one <= CHUNK_PAIRS chunk's device phase (pack,
        upload, fused monolith, async output copies) without blocking;
        finish it with finishPairs.  Up to TWO handles may safely be in
        flight at once (finalize scratch is double-buffered: a finished
        AlignResult's views stay valid until the SECOND finishPairs
        call after it).  NOTE: the streamed driver deliberately keeps
        ONE handle in flight — queuing program k+1 ahead of chunk k's
        output downloads starves them on a tunneled link's serialized
        command queue (measured REJECT, docs/BENCH_NOTES.md round 4);
        2-deep dispatch remains correct for locally attached chips."""
        if prepared is not None:
            assert prepared["n0"] == len(codes1)
            h = self._dispatchInner(
                prepared["codes1"], prepared["len1"],
                prepared["codes2"], prepared["len2"],
                prepared=prepared,
            )
            h["n0"] = prepared["n0"]
            return h
        assert len(codes1) <= self.CHUNK_PAIRS
        c1, l1, c2, l2, N0 = self._padToBucket(codes1, len1, codes2, len2)
        h = self._dispatchInner(c1, l1, c2, l2)
        h["n0"] = N0
        return h

    def finishPairs(self, h: dict, host_work=None, host_join=None):
        """Blocking half of dispatchPairs: downloads + traceback +
        finalize -> AlignResult (trimmed to the dispatched row count)."""
        result = self._finishInner(
            h, host_work=host_work, host_join=host_join
        )
        if len(h["codes1"]) > h["n0"]:
            result = self._trimResult(result, h["n0"])
        return result

    def _alignPairsInner(
        self,
        codes1: np.ndarray,
        len1: np.ndarray,
        codes2: np.ndarray,
        len2: np.ndarray,
        host_work=None,
        prepared=None,
        host_join=None,
    ) -> AlignResult:
        h = self._dispatchInner(codes1, len1, codes2, len2,
                                prepared=prepared)
        return self._finishInner(h, host_work=host_work,
                                 host_join=host_join)

    def _dispatchInner(
        self, codes1, len1, codes2, len2, prepared=None
    ) -> dict:
        """Device half of one chunk: pack/upload + the fused monolith
        dispatch + async output copies.  Returns a handle for
        _finishInner; nothing blocks here, so a second chunk can be
        dispatched before the first is finished (the device then runs
        them back to back with no idle gap)."""
        RL = self.p.read_len

        # --- host: build the ONE upload buffer — packed forward mates
        # + a 2-byte length trailer per read; reverse-complement
        # streams are derived on device (fewer bytes and one
        # round-trip across the link).  Packing is one threaded native
        # pass into persistent scratch (numpy fallback: concatenate +
        # packCodes4bit).  A prepareUpload() handle skips all of this —
        # its transfer is already in flight.
        if prepared is not None:
            buf_dev = prepared["buf_dev"]
            exc_dev = prepared.get("exc_dev")
            buf_shape = prepared["buf_shape"]
            l1c, l2c = prepared["l1c"], prepared["l2c"]
        else:
            # double-buffer the pack scratch per dispatch (per thread,
            # like prepareUpload's _pf_toggles): dispatchPairs allows a
            # second handle in flight, and packing it into the SAME host
            # buffer could overwrite bytes whose host->device transfer
            # from the first dispatch has not completed yet
            toggles = self.__dict__.setdefault("_disp_toggles", {})
            tid = threading.get_ident()
            toggle = toggles.get(tid, 0)
            toggles[tid] = 1 - toggle
            buf, exc, l1c, l2c = self._packAny(
                codes1, len1, codes2, len2, key_suffix=f"_d{toggle}"
            )
            buf_dev = jnp.asarray(buf)
            exc_dev = None if exc is None else jnp.asarray(exc)
            buf_shape = buf.shape

        # --- device: upload decode + seed + score + concordant pairing +
        # winner selection + ungapped-shortcut decision, fused into ONE
        # dispatch; download ONE packed array (one round-trip each way)
        w_d, pkx_d = self._device_mono_tb(
            buf_dev, RL, _uniformLen(l1c, l2c), exc=exc_dev
        )
        # start the device->host copies NOW: the runtime performs them as
        # soon as the monolith finishes, i.e. DURING the host_work window
        # below, so the blocking np.asarray calls later find the bytes
        # already on host instead of serializing transfer-after-window
        # (measured on the tunneled link: docs/BENCH_NOTES.md round 4).
        # KGT_NO_ASYNC_D2H=1 restores the old behaviour for A/B runs.
        if not os.environ.get("KGT_NO_ASYNC_D2H"):
            for _out in (w_d, pkx_d):
                try:
                    _out.copy_to_host_async()
                except Exception:  # backend without async D2H: harmless
                    break
        return {
            "w_d": w_d, "pkx_d": pkx_d, "buf_shape": buf_shape,
            "codes1": codes1, "len1": len1,
            "codes2": codes2, "len2": len2,
        }

    def _finishInner(
        self, h: dict, host_work=None, host_join=None
    ) -> AlignResult:
        codes1, len1 = h["codes1"], h["len1"]
        codes2, len2 = h["codes2"], h["len2"]
        buf_shape = h["buf_shape"]
        N = len(codes1)
        RL = self.p.read_len
        if host_work is not None:
            # everything device-side for this batch is dispatched —
            # including the hard-job traceback, fused into the same
            # program; run the caller's host work (e.g. annotation of
            # the previous chunk) while the kernels execute.  No scratch
            # buffer has been written yet, so previous AlignResult views
            # stay valid until this returns.
            host_work()
        with _seg("download_winners"):
            w = np.asarray(h["w_d"])  # [9, N] int16
        device_hard = None
        with _seg("download_tb"):
            pkx = np.asarray(h["pkx_d"])  # ONE transfer: meta + pk rows
            HB, mrows = tracebackLayout(buf_shape[0] // 2, RL)
            assert mrows + HB == pkx.shape[0], (mrows, HB, pkx.shape)
            meta = np.frombuffer(
                pkx[:mrows].tobytes()[: 4 * (HB + 1)], np.int32
            )
            n_hard = int(meta[-1])
            if n_hard <= HB:
                start_col, delta = unpackTraceback(
                    np.ascontiguousarray(pkx[mrows:mrows + n_hard])
                )
                # meta[:n_hard] = the device's compacted job rows
                # (mate*N + pair): _tracebackJobs cross-checks them
                # against its own hard-job order before trusting pk
                device_hard = (meta[:n_hard], start_col, delta)
            # else: overflow — _tracebackJobs re-dispatches the old path
        if host_join is not None:
            # last point where the PREVIOUS AlignResult's scratch views
            # are untouched: background host work the caller started in
            # host_work (e.g. the stream driver's threaded annotate)
            # must finish before the finalize below overwrites them
            host_join()
        g1, g2, d1, d2 = w[0:4].astype(np.int32)
        best = w[4].view(np.float16)
        by = w[5:9].astype(np.int32)  # byte-packed lo|hi<<8, all in [0,127]
        isrc1, isrc2 = (by[0] & 0xFF).astype(bool), (by[0] >> 8).astype(bool)
        eoff1, eoff2 = by[1] & 0xFF, by[1] >> 8
        nh, mapped = by[2] & 0xFF, (by[2] >> 8).astype(bool)
        easy1, easy2 = (by[3] & 0xFF).astype(np.int8), \
            (by[3] >> 8).astype(np.int8)
        w01 = d1 * DIAG_BUCKET - DIAG_BUCKET
        w02 = d2 * DIAG_BUCKET - DIAG_BUCKET
        row_true = self._row_true
        logger.info(
            f"[Align] {N} pairs -> {int(mapped.sum())} concordant"
        )

        # oriented-read buffers for the annotator: reverse-complement only
        # the rows whose winner is the rc stream (host rc of the full
        # batch would double the work for nothing).  Scratch is
        # double-buffered (toggle suffix): with two chunks in flight the
        # previous AlignResult's views must survive THIS finalize — they
        # stay valid until the second finish after theirs.
        import threading

        tog = self.__dict__.setdefault("_fin_toggles", {})
        tid = threading.get_ident()
        t = tog.get(tid, 0)
        tog[tid] = 1 - t
        l1, l2 = len1.astype(np.int32), len2.astype(np.int32)
        with _seg("orient_bufs"):
            from ..native_io import orientRowsNative

            oc1 = self._hostBuf(f"oc1_{t}", (N, RL), np.int8)
            oc2 = self._hostBuf(f"oc2_{t}", (N, RL), np.int8)
            for oc, codes, ln, isrc in (
                (oc1, codes1, l1, isrc1), (oc2, codes2, l2, isrc2),
            ):
                codes = np.ascontiguousarray(codes, dtype=np.int8)
                if not orientRowsNative(
                    codes, np.ascontiguousarray(ln),
                    np.ascontiguousarray(isrc, dtype=np.uint8), oc,
                ):
                    np.copyto(oc, codes)
                    if isrc.any():
                        oc[isrc] = revCompCodes(codes[isrc], ln[isrc])

        midx = np.nonzero(mapped)[0]
        with _seg("cols_fill"):
            cols_l = self._hostBuf(f"cols_l_{t}", (N, RL), np.int32)
            cols_r = self._hostBuf(f"cols_r_{t}", (N, RL), np.int32)
            # mapped rows are fully overwritten by the column finalize
            # (easy synthesis and hard traceback both write every column
            # of both mates) — only unmapped rows need the -1 pad, so
            # skip the full 2x[N, RL] memset on the ~100%-mapped norm
            unm = ~mapped
            if unm.any():
                cols_l[unm] = -1
                cols_r[unm] = -1
        if len(midx):
            # both mates' winners in ONE traceback dispatch; columns are
            # finalized (junction shift applied) and scattered straight
            # into cols_l/cols_r by mate
            nw = len(midx)
            self._tracebackJobs(
                np.concatenate([g1[midx], g2[midx]]),
                np.concatenate([w01[midx], w02[midx]]),
                np.concatenate([oc1[midx], oc2[midx]]),
                np.concatenate([l1[midx], l2[midx]]),
                easy=np.concatenate(
                    [easy1[midx], easy2[midx]]
                ).astype(bool),
                end_off=np.concatenate([eoff1[midx], eoff2[midx]]),
                dest_row=np.concatenate([midx, midx]).astype(np.int64),
                dest_which=np.concatenate(
                    [np.zeros(nw, np.uint8), np.ones(nw, np.uint8)]
                ),
                dst0=cols_l,
                dst1=cols_r,
                device_hard=device_hard,
            )

        return AlignResult(
            gene=np.where(mapped, row_true[g1], -1).astype(np.int32),
            nh=np.where(mapped, nh, 0).astype(np.int32),
            cost=np.where(mapped, best, np.inf).astype(np.float32),
            rc_l=isrc1,
            rc_r=isrc2,
            cols_l=cols_l,
            cols_r=cols_r,
            bases_l=oc1,
            bases_r=oc2,
            len_l=len1.astype(np.int32),
            len_r=len2.astype(np.int32),
        )
