"""
Device-emitted variant evidence: the per-read classification that
`align/annotate.py` does on host (mirroring reference hisat2.py:279-515,
716-800) moved into one fused TPU dispatch.

Per chunk the aligner's monolith already leaves everything the annotator
needs on device: the packed read codes, the winner placements, and the
index tables.  This module adds a second dispatch that

1. synthesizes the traceback columns for the gapless ("easy") majority
   and runs the pointer DP only for the gapped minority,
2. classifies every consumed base (known SNP / novel SNV / N), detects
   deletion runs, canonicalises and matches them against the catalog,
3. computes per-mate NM, the negative-evidence span [lo, hi) and a
   64-bit in-span positive mask, and
4. scatters the depth/pileup counts -

then downloads ONE packed int32 buffer (~1.5 MB per 32k-pair chunk)
instead of per-base traceback columns.  The host's remaining jobs are
novel-SNV registration, negative-span expansion and CSR assembly —
pure-numpy work an order of magnitude below the old per-base passes.

Bit-identical to `VariantAnnotator.annotateArrays` (the numpy oracle);
asserted in tests/test_device_annotate.py.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..index.variants import IdAllocator, Variant
from ..utils import logger
from .annotate import EvidenceArrays, VariantAnnotator, _csrConcat
from .dp import bandedTraceback, _gatherWindowsPacked
from .pipeline import PAD_L, GraphAligner, _prepStreams, _seg
from .seeding import DIAG_BUCKET


def _interleave(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N] x [N] -> [2N] with a at even rows (pair-major, mate-minor)."""
    return jnp.stack([a, b], axis=1).reshape(-1)


class DeviceAnnotator:
    """Fused traceback + classification companion for one
    (GraphAligner, VariantAnnotator) pair."""

    MAX_HARD = 16384          # pointer-DP memory bound per dispatch
    SPAN_BITS = 64            # in-span positive mask width

    def __init__(self, aligner: GraphAligner, annotator: VariantAnnotator):
        self.aligner = aligner
        self.annotator = annotator
        self.ok = self._buildTables()
        if self.ok:
            self._kernel = self._buildKernel()

    # ------------------------------------------------------------------
    def _buildTables(self) -> bool:
        ann = self.annotator
        idx = ann.index
        Gt = len(ann.tables)
        _, Lmax = idx.backbone.shape
        Vtot = int(ann.gvar_start[-1])
        # packing preconditions (host fallback otherwise); read_len must
        # fit the 8-bit per-mate counters (reg_cnt/ncol_cnt/d_cnt) that
        # _assemble trusts to sum to the true stream totals
        if Lmax > 32766 or Vtot >= (1 << 24):
            return False
        if self.aligner.p.read_len > 255:
            return False
        # the kernel's pass/NM filter uses the aligner's annot_editdist;
        # bit-identity with the host path requires the annotator to use
        # the same bound (host fallback otherwise)
        if self.aligner.annot_editdist != ann.num_editdist:
            return False
        if len(ann.del_keys) and int(ann.del_keys[-1]) >= 2**31 - 1:
            return False
        self.Lmax = Lmax
        self.Gt = Gt
        self.Vtot = Vtot
        al = self.aligner
        # FLAT tables + 1-D int32 index gathers: multi-dim advanced
        # indexing lowers to a slow TPU gather path (measured 312 ms for
        # the classify block at 32k pairs vs ~35 ms flat)
        self.t_seq = jnp.asarray(ann.seq_g.astype(np.int8).reshape(-1))
        self.t_snp = jnp.asarray(ann.snp_lookup_g.reshape(-1))  # i32
        self.t_ignore = jnp.asarray(ann.g_ignore.astype(np.int32))
        self.t_lo = jnp.asarray(ann.lo_at.astype(np.int32).reshape(-1))
        self.t_hi = jnp.asarray(ann.hi_at.astype(np.int32).reshape(-1))
        self.t_dk = jnp.asarray(ann.del_keys.astype(np.int32))
        self.t_dv = jnp.asarray(ann.del_vals.astype(np.int32))
        self.t_glen = jnp.asarray(al._glenAll().astype(np.int32))
        self.t_row_true = jnp.asarray(al._row_true.astype(np.int32))
        self.t_row_pos = jnp.asarray(
            np.minimum(al._row_pos, 2**30).astype(np.int32)
        )
        self.t_row_len = jnp.asarray(al._row_len.astype(np.int32))
        self._del_span = ann._del_span
        self._del_maxlen = ann._del_maxlen
        return True

    # ------------------------------------------------------------------
    def _buildKernel(self):
        al = self.aligner
        p = al.p
        Lmax, Gt, Vtot = self.Lmax, self.Gt, self.Vtot
        span_ml = np.int32(self._del_maxlen)
        span_sp = np.int32(self._del_span)
        editdist = al.annot_editdist
        # the per-gene tables travel as jit ARGUMENTS: closed-over device
        # arrays become MLIR constants that every per-bucket compile
        # fetches device->host during lowering (minutes on a congested
        # tunnel — same issue as align/pipeline.py's monolith)
        self._tables = (
            self.t_seq, self.t_snp, self.t_ignore, self.t_lo, self.t_hi,
            self.t_dk, self.t_dv, self.t_glen,
            self.t_row_true, self.t_row_pos, self.t_row_len,
            al._backbone, al._altdel,
        )

        def kernel(tables, buf, w, hard_rows, RL, Hb, stage=99,
                   uniform_len=None):
            # `stage` (static) truncates the program for profiling:
            # 1=cols, 2=snp classify, 3=del runs, 4=nm/spans/mask,
            # 5=streams, 99=full (scripts/profile_device_annotate.py)
            (seq_g, snp_g, ignore_g, lo_at, hi_at, dk, dv, glen_all,
             row_true, row_pos, row_len, backbone, altdel) = tables
            def early(*xs):
                return sum(x.astype(jnp.int32).sum() for x in xs)
            codes_all, _, lens_all = _prepStreams(
                buf, RL, uniform_len=uniform_len
            )
            N = buf.shape[0] // 2
            M = 2 * N
            # --- winner decode (mirrors pipeline.py's host decode)
            by = w[5:9].astype(jnp.int32) & 0xFFFF
            g_ps = _interleave(w[0], w[1]).astype(jnp.int32)
            w0 = _interleave(w[2], w[3]).astype(jnp.int32) * DIAG_BUCKET \
                - DIAG_BUCKET
            isrc = _interleave(by[0] & 0xFF, by[0] >> 8)
            eoff = _interleave(by[1] & 0xFF, by[1] >> 8)
            nh = (by[2] & 0xFF).astype(jnp.int32)
            mapped = (by[2] >> 8) > 0
            mapped_m = _interleave(mapped, mapped)
            lens_m = _interleave(lens_all[:N], lens_all[N:]).astype(jnp.int32)

            pair = jnp.arange(N, dtype=jnp.int32)
            rows_sel = _interleave(
                isrc[0::2] * N + pair, (2 + isrc[1::2]) * N + pair
            )
            bases = codes_all[rows_sel]                       # [M, RL] i8

            # --- easy columns (window-relative) + hard traceback scatter
            i_ = jnp.arange(RL, dtype=jnp.int32)[None, :]
            rel = jnp.broadcast_to(
                eoff[:, None].astype(jnp.int32) + i_, (M, RL)
            )
            hr = hard_rows
            hsafe = jnp.clip(hr, 0)
            h_gene = jnp.clip(g_ps[hsafe], 0)
            h_w0 = w0[hsafe]
            h_codes = bases[hsafe]
            h_lens = jnp.where(hr >= 0, lens_m[hsafe], 1)
            wb, wa, wd = _gatherWindowsPacked(
                backbone, altdel, h_gene, h_w0, PAD_L, p.window, p
            )
            _, h_cols = bandedTraceback(wb, wa, wd, h_codes, h_lens, p)
            tgt = jnp.where(hr >= 0, hr, 1 << 30)  # pad rows: dropped
            rel = rel.at[tgt].set(h_cols, mode="drop")

            # window-relative rel (>=0 consumed col, -2 insertion, -1 pad)
            # -> finalized absolute cols, mirroring the host finalize:
            # out-of-reference -3 BEFORE the pseudo-ref junction shift
            in_len = i_ < lens_m[:, None]
            ins = in_len & (rel == -2)
            is_col = in_len & (rel >= 0) & mapped_m[:, None]
            abs_c = rel + w0[:, None]
            glen = glen_all[jnp.clip(g_ps, 0)]
            oor = is_col & ((abs_c < 0) | (abs_c >= glen[:, None]))
            cols = jnp.where(
                is_col & ~oor, abs_c,
                jnp.where(ins & mapped_m[:, None], -2,
                          jnp.where(oor, -3, -1)),
            )
            shift = ((cols >= row_pos[jnp.clip(g_ps, 0)][:, None])
                     & (cols >= 0)) * row_len[jnp.clip(g_ps, 0)][:, None]
            cols = cols + shift
            if stage == 1:
                return early(cols), None, None

            # --- classification (annotate.py:annotateArrays, dense form)
            gtrue = row_true[jnp.clip(g_ps, 0)]
            consumed = (cols >= 0) & in_len
            any_cons = consumed.any(axis=1)
            overhang = ((cols == -3) & in_len).any(axis=1)
            n_ins = ((cols == -2) & in_len).sum(axis=1)
            safe_cols = jnp.clip(cols, 0, Lmax - 1)
            gcol = gtrue[:, None] * Lmax + safe_cols      # [M, RL] flat
            bb = seq_g[gcol]
            if stage == 21:
                return early(bb), None, None
            mm = consumed & (bases != bb)
            nmask = bases >= 4
            mm_snp = mm & ~nmask
            mm_n = mm & nmask
            snp_gidx = jnp.where(
                mm_snp,
                snp_g[gcol * 4 + jnp.clip(bases, 0, 3).astype(jnp.int32)],
                -1,
            )
            if stage == 22:
                return early(snp_gidx), None, None
            known = mm_snp & (snp_gidx >= 0)
            novel = mm_snp & (snp_gidx < 0)
            novel_cnt = novel.sum(axis=1)
            npos_cnt = mm_n.sum(axis=1)
            ignored_cnt = jnp.where(
                known, ignore_g[jnp.clip(snp_gidx, 0)], 0
            ).sum(axis=1)

            if stage == 2:
                return early(cols, known, novel_cnt, npos_cnt,
                             ignored_cnt), None, None

            # --- deletion runs (compacted before the canonical shift)
            pm = jax.lax.cummax(jnp.where(consumed, cols, -1), axis=1)
            prev = jnp.concatenate(
                [jnp.full((M, 1), -1, jnp.int32), pm[:, :-1]], axis=1
            )
            gap = cols - prev - 1
            run = consumed & (prev >= 0) & (gap > 0)
            CR = M  # cap: >=1 gap costs >=del_eps; far above observed
            rflat = run.reshape(-1)
            rslot = jnp.cumsum(rflat) - 1
            r_total = jnp.where(rflat.any(), rslot[-1] + 1, 0)
            # out-of-bounds sentinel + mode="drop": colliding writes to a
            # shared dump slot serialize XLA's scatter, dropped ones don't
            ridx = jnp.where(rflat & (rslot < CR), rslot, 1 << 30)
            flati = jnp.arange(M * RL, dtype=jnp.int32)

            def compactRuns(vals):
                return jnp.zeros(CR, jnp.int32).at[ridx].set(
                    vals, mode="drop"
                )

            r_row = compactRuns(flati // RL)
            r_start = compactRuns((prev + 1).reshape(-1))
            r_len = compactRuns(gap.reshape(-1))
            r_valid = jnp.arange(CR) < r_total
            r_gene = jnp.where(r_valid, gtrue[jnp.clip(r_row, 0, M - 1)], 0)
            r_lenc = jnp.maximum(r_len, 1)

            r_gbase = r_gene * Lmax

            def shiftCond(canon):
                act = r_valid & (canon > 0) & (
                    seq_g[r_gbase + jnp.clip(canon - 1, 0)]
                    == seq_g[
                        r_gbase + jnp.clip(canon + r_lenc - 1, 0, Lmax - 1)
                    ]
                )
                return act

            def cond(carry):
                canon, it = carry
                return shiftCond(canon).any() & (it < Lmax)

            def body(carry):
                canon, it = carry
                return jnp.where(shiftCond(canon), canon - 1, canon), it + 1

            r_canon, _ = jax.lax.while_loop(
                cond, body, (r_start, jnp.int32(0))
            )

            def delFind(pos_):
                key = (r_gene * span_sp + pos_) * span_ml \
                    + jnp.minimum(r_lenc, span_ml - 1)
                i = jnp.searchsorted(dk, key)
                isafe = jnp.clip(i, 0, max(len(dk) - 1, 0))
                if len(dk) == 0:
                    return jnp.full(CR, -1, jnp.int32)
                okk = (i < len(dk)) & (dk[isafe] == key)
                return jnp.where(okk, dv[isafe], -1)

            d1 = delFind(r_canon)
            d2 = delFind(r_start)
            r_gidx = jnp.where(d1 >= 0, d1, d2)
            r_known = (r_gidx >= 0) & r_valid
            ndl_sel = r_valid & ~r_known
            novel_del_len = jnp.zeros(M, jnp.int32).at[
                jnp.where(ndl_sel, r_row, 1 << 30)
            ].add(r_len, mode="drop")

            if stage == 3:
                return early(r_gidx, novel_del_len), None, None

            # --- NM / pass
            nm = (novel_cnt + npos_cnt + n_ins + novel_del_len
                  + ignored_cnt).astype(jnp.int32)
            nm = jnp.where(any_cons, nm, 99)
            nm = jnp.where(mapped_m, nm, 0)
            ev_empty = (n_ins > 0) | (novel_del_len > 0) | overhang
            nm_pair = nm.reshape(N, 2)
            pass_c = (nm_pair <= editdist).all(axis=1) & mapped
            pass_row = _interleave(pass_c, pass_c) & ~ev_empty

            # --- spans
            rowar = jnp.arange(M)
            first_col = jnp.where(any_cons, jnp.argmax(consumed, axis=1), 0)
            left = cols[rowar, first_col]
            last_col = RL - 1 - jnp.argmax(consumed[:, ::-1], axis=1)
            right = jnp.where(any_cons, cols[rowar, last_col] + 1, 0)
            do_neg = pass_row & any_cons
            gat = jnp.clip(gtrue, 0) * (Lmax + 2)
            lo = jnp.where(
                do_neg, lo_at[gat + jnp.clip(left, 0, Lmax + 1)], 0
            )
            hi = jnp.where(
                do_neg, hi_at[gat + jnp.clip(right, 0, Lmax + 1)], 0
            )
            hi = jnp.maximum(hi, lo)
            span = hi - lo
            span_over = (jnp.where(do_neg, span, 0) > self.SPAN_BITS).sum()

            # --- in-span positive mask: known-SNP bits only (a read
            # carries each catalog SNP at most once, so the bits are
            # unique per row and the OR is a plain row-sum — no scatter;
            # deletion positives are excluded host-side via the d-stream)
            ksel = known & pass_row[:, None]
            kbit = snp_gidx - lo[:, None]
            k_ok = ksel & (kbit >= 0) & (kbit < 64)
            one = jnp.uint32(1)
            mask_lo_w = jnp.where(
                k_ok & (kbit < 32),
                one << jnp.clip(kbit, 0, 31).astype(jnp.uint32),
                jnp.uint32(0),
            ).sum(axis=1, dtype=jnp.uint32)
            mask_hi_w = jnp.where(
                k_ok & (kbit >= 32),
                one << jnp.clip(kbit - 32, 0, 31).astype(jnp.uint32),
                jnp.uint32(0),
            ).sum(axis=1, dtype=jnp.uint32)
            dsel = r_known & pass_row[jnp.clip(r_row, 0, M - 1)]
            if stage == 4:
                return early(nm, lo, hi, mask_lo_w, mask_hi_w,
                             dsel), None, None

            # --- compacted streams (row-major order)
            capU, capC, capD = M, M // 2, M // 4

            def compactFlat(m2d, vals, cap):
                fm = m2d.reshape(-1)
                slot = jnp.cumsum(fm) - 1
                total = jnp.where(fm.any(), slot[-1] + 1, 0)
                idxs = jnp.where(fm & (slot < cap), slot, 1 << 30)
                out = jnp.zeros(cap, jnp.int32).at[idxs].set(
                    vals.reshape(-1), mode="drop"
                )
                return out, total

            reg = novel & ~ev_empty[:, None]
            novel_keys = gcol * 4 + jnp.clip(bases, 0, 3).astype(jnp.int32)
            nbuf, ntot = compactFlat(reg, novel_keys, capU)
            nsel2 = mm_n & pass_row[:, None]
            cbuf, ctot = compactFlat(nsel2, cols, capC)
            dstream_sel = dsel
            dslot = jnp.cumsum(dstream_sel) - 1
            dtot = jnp.where(dstream_sel.any(), dslot[-1] + 1, 0)
            didx = jnp.where(dstream_sel & (dslot < capD), dslot, 1 << 30)
            dbuf = jnp.zeros(capD, jnp.int32).at[didx].set(
                r_gidx, mode="drop"
            )

            reg_cnt = reg.sum(axis=1)
            ncol_cnt = nsel2.sum(axis=1)
            d_cnt = jnp.zeros(M, jnp.int32).at[
                jnp.where(dstream_sel, r_row, 1 << 30)
            ].add(1, mode="drop")

            if stage == 5:
                return early(nbuf, cbuf, dbuf, reg_cnt, ncol_cnt,
                             d_cnt), None, None

            # --- depth / pileup (device-resident outputs)
            uniq_row = _interleave(pass_c, pass_c) & (
                _interleave(nh, nh) == 1
            ) & mapped_m
            sel = consumed & uniq_row[:, None]
            lin = jnp.where(
                sel,
                gcol * 5 + jnp.clip(bases, 0, 4).astype(jnp.int32),
                1 << 30,
            )
            pileup = jnp.zeros(Gt * Lmax * 5, jnp.int32).at[
                lin.reshape(-1)
            ].add(1, mode="drop").reshape(Gt, Lmax, 5)
            depth = pileup.sum(axis=-1)

            # --- pack the single host download
            header = jnp.stack(
                [ntot, ctot, dtot, span_over, r_total, 0, 0, 0]
            ).astype(jnp.int32)
            plane0 = (jnp.clip(nm, 0, 65535)
                      | (jnp.clip(reg_cnt, 0, 255) << 16)
                      | (jnp.clip(ncol_cnt, 0, 255) << 24))
            plane1 = lo | (ev_empty.astype(jnp.int32) << 24)
            plane2 = (jnp.clip(span, 0, 255)
                      | (jnp.clip(d_cnt, 0, 255) << 8)
                      | (jnp.clip(right, 0, 32767) << 16))
            out = jnp.concatenate([
                header,
                plane0, plane1, plane2,
                jax.lax.bitcast_convert_type(mask_lo_w, jnp.int32),
                jax.lax.bitcast_convert_type(mask_hi_w, jnp.int32),
                nbuf, cbuf, dbuf,
            ])
            return out, pileup, depth

        # unjitted closure for the sharded exact path (parallel/exact.py)
        def kernelClosure(buf, w, hard_rows, RL, Hb, stage=99,
                          uniform_len=None):
            return kernel(
                self._tables, buf, w, hard_rows, RL, Hb, stage, uniform_len
            )

        self._kernel_fn = kernelClosure
        jitted = partial(jax.jit, static_argnums=(4, 5, 6, 7))(kernel)
        return lambda buf, w, hard_rows, RL, Hb, stage=99, \
            uniform_len=None: jitted(
                self._tables, buf, w, hard_rows, RL, Hb, stage, uniform_len
            )

    # ------------------------------------------------------------------
    def annotateChunk(
        self, codes1, len1, codes2, len2, host_work=None
    ):
        """One <=CHUNK_PAIRS chunk, synchronous; None on cap overflow."""
        fin = self.dispatchChunk(
            codes1, len1, codes2, len2, host_work=host_work
        )
        return fin() if fin is not None else None

    def _packChunk(self, codes1, len1, codes2, len2, bucket=None):
        """Pad to a shape bucket + nibble-pack into (host buf, N0, Nb)."""
        al = self.aligner
        N0 = len(codes1)
        from ..index.build import BASE_PAD
        from ..native_io import packUploadNative
        from .encode import packCodes4bit

        RL = al.p.read_len
        Nb = bucket or al._bucket(N0, al.CHUNK_PAIRS)
        if Nb > N0:
            pad = Nb - N0
            codes1 = np.concatenate(
                [codes1, np.full((pad, RL), BASE_PAD, np.int8)]
            )
            codes2 = np.concatenate(
                [codes2, np.full((pad, RL), BASE_PAD, np.int8)]
            )
            len1 = np.concatenate([len1, np.full(pad, 1, len1.dtype)])
            len2 = np.concatenate([len2, np.full(pad, 1, len2.dtype)])
        N = Nb

        with _seg("pack_upload"):
            W = -(-RL // 2) + 2
            # double-buffered host scratch: the pipelined driver keeps
            # chunk k's dispatch alive while packing chunk k+1, and on
            # CPU backends jnp.asarray may alias the numpy buffer
            self._bufflip = getattr(self, "_bufflip", 0) ^ 1
            buf = al._hostBuf(
                f"da_upload_{self._bufflip}", (2 * N, W), np.uint8
            )
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
        return buf, N0, N

    @staticmethod
    def _hardBucket(n: int) -> int:
        """x2 shape buckets for the pointer-DP job count (x4 wastes up
        to 2.8x of the traceback's scan time)."""
        b = 256
        while b < n:
            b *= 2
        return b

    def hardRows(self, w: np.ndarray) -> np.ndarray:
        """Interleaved mate rows whose winner needs the pointer DP."""
        by = w[5:9].astype(np.int32) & 0xFFFF
        mapped = (by[2] >> 8).astype(bool)
        easy1 = (by[3] & 0xFF).astype(bool)
        easy2 = (by[3] >> 8).astype(bool)
        hard_l = np.nonzero(mapped & ~easy1)[0]
        hard_r = np.nonzero(mapped & ~easy2)[0]
        return np.concatenate([2 * hard_l, 2 * hard_r + 1]).astype(np.int32)

    def dispatchChunk(
        self, codes1, len1, codes2, len2, host_work=None
    ):
        """Dispatch one <=CHUNK_PAIRS chunk through the fused path.

        Returns a finish() closure producing (EvidenceArrays, depth,
        pileup) — depth/pileup stay device-resident (downstream device
        stages consume them; numpy consumers force the download lazily).
        finish() returns None when a runtime cap overflowed (caller
        falls back to the host path); dispatchChunk itself returns None
        when the hard-job count exceeds the pointer-DP bound."""
        al = self.aligner
        assert len(codes1) <= al.CHUNK_PAIRS
        RL = al.p.read_len
        from .pipeline import _uniformLen

        ul = _uniformLen(
            np.asarray(len1, dtype=np.int32), np.asarray(len2, dtype=np.int32)
        )
        buf, N0, N = self._packChunk(codes1, len1, codes2, len2)
        buf_dev = jnp.asarray(buf)
        w_dev = al._device_mono(buf_dev, RL, ul)
        if host_work is not None:
            host_work()
        with _seg("download_winners"):
            w = np.asarray(w_dev)
        hard = self.hardRows(w)
        n_hard = len(hard)
        if n_hard > self.MAX_HARD:
            return None
        Hb = self._hardBucket(n_hard)
        hard_rows = np.full(Hb, -1, np.int32)
        hard_rows[:n_hard] = hard

        out_dev, pileup, depth = self._kernel(
            buf_dev, w_dev, jnp.asarray(hard_rows), RL, Hb, 99, ul
        )

        def finish():
            with _seg("download_evidence"):
                out = np.asarray(out_dev)
            ev = self._assemble(w, out, N0, N)
            if ev is None:
                return None
            return ev, depth, pileup

        return finish

    # ------------------------------------------------------------------
    def _assemble(
        self, w: np.ndarray, out: np.ndarray, N0: int, N: int
    ) -> EvidenceArrays | None:
        ann = self.annotator
        al = self.aligner
        M = 2 * N
        capU, capC, capD = M, M // 2, M // 4
        Lmax, Vtot = self.Lmax, self.Vtot
        header = out[:8]
        ntot, ctot, dtot, span_over, r_total = (int(x) for x in header[:5])
        if (span_over or ntot > capU or ctot > capC or dtot > capD
                or r_total > M):
            logger.info(
                "[Align] device annotate cap overflow "
                f"(span_over={span_over} novel={ntot} ncol={ctot} "
                f"del={dtot} runs={r_total}); falling back to host path"
            )
            return None
        o = 8
        plane0 = out[o:o + M]; o += M
        plane1 = out[o:o + M]; o += M
        plane2 = out[o:o + M]; o += M
        mask_lo = out[o:o + M].view(np.uint32); o += M
        mask_hi = out[o:o + M].view(np.uint32); o += M
        nbuf = out[o:o + capU]; o += capU
        cbuf = out[o:o + capC]; o += capC
        dbuf = out[o:o + capD]

        with _seg("assemble_evidence"):
            nm = (plane0 & 0xFFFF).astype(np.int32)
            reg_cnt = (plane0 >> 16) & 0xFF
            ncol_cnt = (plane0 >> 24) & 0xFF
            lo = (plane1 & 0xFFFFFF).astype(np.int64)
            ev_empty = ((plane1 >> 24) & 1).astype(bool)
            span = (plane2 & 0xFF).astype(np.int64)
            d_cnt = (plane2 >> 8) & 0xFF
            right = ((plane2 >> 16) & 0x7FFF).astype(np.int64)

            # host-side decode mirrors the device pass/NM rule
            by = w[5:9].astype(np.int32) & 0xFFFF
            mapped = (by[2] >> 8).astype(bool)[:N]
            nh = (by[2] & 0xFF).astype(np.int32)[:N]
            g1 = w[0].astype(np.int32)[:N]
            nm2 = nm.reshape(N, 2).T
            pass_c = (nm2 <= al.annot_editdist).all(axis=0) & mapped
            pass_row = np.repeat(pass_c, 2) & ~ev_empty

            rowar = np.arange(M, dtype=np.int64)
            # novel registration: row-major first occurrence (annotate.py)
            rows_u = np.repeat(rowar, reg_cnt)
            keys_u = nbuf[:ntot].astype(np.int64)
            uniq_keys, first_idx, inverse = np.unique(
                keys_u, return_index=True, return_inverse=True
            )
            order = np.argsort(first_idx, kind="stable")
            rank_of_uniq = np.empty(len(uniq_keys), dtype=np.int64)
            rank_of_uniq[order] = np.arange(len(uniq_keys))
            novel_variants: list[Variant] = []
            novel_ids = IdAllocator()
            ids_all = np.concatenate(
                [ann.g_ids, np.empty(len(uniq_keys), dtype=object)]
            )
            for u in order:
                key = int(uniq_keys[u])
                b = key % 4
                pp = (key // 4) % Lmax
                gi = key // (4 * Lmax)
                v = Variant(
                    pos=int(pp), typ="single", ref=ann.tables[gi].name,
                    val="ACGT"[b], id=novel_ids.nextNovel(),
                )
                novel_variants.append(v)
            for i, v in enumerate(novel_variants):
                ids_all[Vtot + i] = str(v.id)
            v_keep = pass_row[rows_u]
            v_rows = rows_u[v_keep]
            v_gidx = (Vtot + rank_of_uniq[inverse])[v_keep] \
                if ntot else np.zeros(0, np.int64)

            # span expansion (annotate.py negative rules)
            counts = span
            cand_rows = np.repeat(rowar, counts)
            base_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
            cand_off = (
                np.arange(len(cand_rows)) - np.repeat(base_off, counts)
            )
            cand_gidx = cand_off + np.repeat(lo, counts)
            m64 = (mask_hi.astype(np.uint64) << np.uint64(32)) \
                | mask_lo.astype(np.uint64)
            is_pos = (
                (m64[cand_rows] >> cand_off.astype(np.uint64))
                & np.uint64(1)
            ).astype(bool)
            cand_is_del = ann.g_is_del[cand_gidx] \
                if Vtot else np.zeros(0, bool)
            k_sel = is_pos & ~cand_is_del
            krows = cand_rows[k_sel]
            k_gidx = cand_gidx[k_sel]
            d_rows = np.repeat(rowar, d_cnt)
            d_gidx = dbuf[:dtot].astype(np.int64)

            keep = ~is_pos
            # deletion positives are not in the bitmask (annotate.py's
            # pos_set exclusion covers them via isin)
            if dtot:
                Vbig = np.int64(max(Vtot, 1))
                keep &= ~np.isin(
                    cand_rows * Vbig + cand_gidx, d_rows * Vbig + d_gidx
                )
            nr2 = np.repeat(rowar, ncol_cnt)
            ncols_keys = nr2 * np.int64(Lmax + 1) + cbuf[:ctot]
            cand_pos = ann.g_pos[cand_gidx] if Vtot else np.zeros(0, np.int64)
            snp_at_n = ~cand_is_del & np.isin(
                cand_rows * np.int64(Lmax + 1) + cand_pos, ncols_keys
            )
            keep &= ~snp_at_n
            cand_val = ann.g_val[cand_gidx] if Vtot else np.zeros(0, np.int64)
            keep &= ~(cand_is_del
                      & (cand_pos + cand_val + 10 >= right[cand_rows]))
            neg_rows = cand_rows[keep]
            neg_gidx = cand_gidx[keep]

            pos_indptr, pos_idx = _csrConcat(
                M, [(krows, k_gidx), (d_rows, d_gidx), (v_rows, v_gidx)]
            )
            neg_counts = np.bincount(neg_rows, minlength=M)
            neg_indptr = np.concatenate([[0], np.cumsum(neg_counts)])

            row_true = al._row_true
            ev = EvidenceArrays(
                gene=np.where(mapped, row_true[g1], -1).astype(np.int32)[:N0],
                nh=np.where(mapped, nh, 0).astype(np.int32)[:N0],
                nm=nm2.astype(np.int32)[:, :N0],
                pass_mask=pass_c[:N0],
                pos_indptr=pos_indptr[: 2 * N0 + 1],
                pos_idx=pos_idx[: pos_indptr[2 * N0]],
                neg_indptr=neg_indptr[: 2 * N0 + 1],
                neg_idx=neg_gidx[: neg_indptr[2 * N0]],
                ids=ids_all,
                novel_variants=novel_variants,
                n_catalog=int(Vtot),
            )
        logger.info(
            f"[Align] pairs mapped {int(mapped[:N0].sum())}, "
            f"passed NM filter {int(ev.pass_mask.sum())}, "
            f"unique {int((ev.pass_mask & (ev.nh == 1)).sum())}"
        )
        return ev


def getDeviceAnnotator(
    aligner: GraphAligner, annotator: VariantAnnotator
) -> DeviceAnnotator | None:
    """Cached DeviceAnnotator for the pair, or None when disabled.

    Default: DISABLED — measured on the v5e, the fused classification
    kernel costs ~0.8 s per 32k-pair chunk (TPU gathers/scans over the
    dense [2N, RL] arrays run at ~100-200 M elem/s) while the host C++
    core does the same work in ~0.08 s, so the single-chip exact path is
    faster through the host (docs/BENCH_NOTES.md round 3).  The kernel
    remains the basis of the multi-chip sharded exact path
    (parallel/exact.py constructs DeviceAnnotator directly: on a pod the
    per-chip classification scales with chips while a single host would
    serialize), and stays bit-identical-tested.  Opt in with
    KGT_DEVICE_ANNOTATE=1."""
    knob = os.environ.get("KGT_DEVICE_ANNOTATE", "")
    if knob != "1":
        return None
    cached = getattr(annotator, "_device_annotator", None)
    if cached is not None and cached.aligner is aligner:
        return cached if cached.ok else None
    da = DeviceAnnotator(aligner, annotator)
    annotator._device_annotator = da
    return da if da.ok else None
