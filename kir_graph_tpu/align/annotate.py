"""
Placement annotation: traceback columns -> per-read variant evidence.

Fuses what the reference does over a BAM round-trip — CIGAR/MD/Zs parsing
(hisat2.py:279-515), novel-variant registration (581-606), and
positive/negative variant extraction (716-800) — into vectorised array ops
over the aligner's traceback columns.  Also emits depth and pileup counts
(replacing `samtools depth -aa` / `mpileup`).
"""
from __future__ import annotations

import bisect
from dataclasses import dataclass

import numpy as np

from ..index.build import KirIndex
from ..index.variants import IdAllocator, Variant
from ..utils import logger
from .pipeline import AlignResult
from ..typing.pairread import PairRead

_TYPE_RANK = {"insertion": 0, "single": 1, "deletion": 2}


def _csrConcat(
    n_rows: int, groups: list[tuple[np.ndarray, np.ndarray]]
) -> tuple[np.ndarray, np.ndarray]:
    """Merge (rows, values) groups into one CSR, keeping rows sorted and,
    within a row, group order first then each group's original order."""
    rows = np.concatenate([r.astype(np.int64) for r, _ in groups])
    vals = np.concatenate([v.astype(np.int64) for _, v in groups])
    gid = np.concatenate(
        [np.full(len(r), i, dtype=np.int64) for i, (r, _) in enumerate(groups)]
    )
    order = np.argsort(rows * len(groups) + gid, kind="stable")
    rows, vals = rows[order], vals[order]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.add.at(indptr, rows + 1, 1)
    return np.cumsum(indptr), vals


def _canonDelPos(seq: np.ndarray, pos: int, length: int) -> int:
    """Left-align a deletion run against the backbone (VCF-style)."""
    while pos > 0 and seq[pos - 1] == seq[pos + length - 1]:
        pos -= 1
    return pos


@dataclass
class GeneTables:
    name: str
    var_keys: list            # sort keys [(pos, rank, val)] for span bisect
    var_ids: list[str]
    var_pos: np.ndarray
    var_is_del: np.ndarray
    var_val: np.ndarray
    var_in_exon: np.ndarray
    var_ignore: np.ndarray
    del_lookup: dict          # (canon_pos, len) -> local idx
    snp_lookup: np.ndarray    # [L, 4] -> local idx (-1)
    seq: np.ndarray


@dataclass
class EvidenceArrays:
    """Array-form per-read variant evidence (no per-read Python objects).

    Rows are mates interleaved read-major/mate-minor: row 2n = left mate of
    pair n, row 2n+1 = right mate.  Variant indices are global: [0, Vtot)
    indexes the concatenated per-gene catalogs (`ids`), [Vtot, Vtot+Nnov)
    the novel SNVs registered in this batch (`novel_variants`).
    """

    gene: np.ndarray            # [N] int32 pair gene (-1 unmapped)
    nh: np.ndarray              # [N] int32
    nm: np.ndarray              # [2, N] int32 per-mate edit distance
    pass_mask: np.ndarray       # [N] bool — concordant and both mates NM<=k
    pos_indptr: np.ndarray      # [2N+1] CSR over interleaved mate rows
    pos_idx: np.ndarray         # [P] int64 global variant indices
    neg_indptr: np.ndarray      # [2N+1]
    neg_idx: np.ndarray         # [Q] int64
    ids: np.ndarray             # [Vtot+Nnov] object: catalog + novel ids
    novel_variants: list        # list[Variant]
    n_catalog: int              # Vtot

    def mateSlices(self, n: int) -> tuple[slice, slice]:
        return (
            slice(self.pos_indptr[2 * n], self.pos_indptr[2 * n + 1]),
            slice(self.pos_indptr[2 * n + 1], self.pos_indptr[2 * n + 2]),
        )


def minorityCorrection(
    counts: np.ndarray, own_base: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The reference's pileup minority-base rule (hisat2.py:609-654),
    shared by the one-shot batch EC, the per-read oracle and the
    streamed two-pass EC (their bit-identity tests ride on this single
    implementation).

    counts: [k, 4] ACGT pileup at each candidate (mismatching) column;
    own_base: [k] the read's base there.  Returns (fix, maj, to_n):
    columns with depth >= 20 where the read's base is <= 20% either take
    the >= 80% majority base (`fix` -> maj) or become N (`to_n`)."""
    totals = counts.sum(axis=1)
    frac = counts / np.maximum(totals, 1)[:, None]
    own = frac[np.arange(len(counts)), own_base]
    minority = (totals >= 20) & (own <= 0.2)
    maj = frac.argmax(axis=1)
    has_major = frac.max(axis=1) >= 0.8
    return minority & has_major, maj, minority & ~has_major


class VariantAnnotator:
    def __init__(self, index: KirIndex, num_editdist: int = 4):
        self.index = index
        self.num_editdist = num_editdist
        self.tables: list[GeneTables] = []
        for name in index.gene_names:
            g = index.genes[name]
            snp_lookup = np.full((g.length, 4), -1, dtype=np.int32)
            del_lookup: dict = {}
            keys = []
            for i, v in enumerate(g.variants):
                val = v.val if v.typ == "deletion" else str(v.val)
                keys.append((v.pos, _TYPE_RANK[v.typ], str(val)))
                if v.typ == "single":
                    snp_lookup[v.pos, int(g.var_val[i])] = i
                else:
                    canon = _canonDelPos(g.seq, v.pos, int(v.val))
                    del_lookup[(canon, int(v.val))] = i
                    del_lookup.setdefault((v.pos, int(v.val)), i)
            self.tables.append(
                GeneTables(
                    name=name,
                    var_keys=keys,
                    var_ids=[str(v.id) for v in g.variants],
                    var_pos=g.var_pos,
                    var_is_del=g.var_is_del,
                    var_val=g.var_val,
                    var_in_exon=g.var_in_exon,
                    var_ignore=g.var_ignore,
                    del_lookup=del_lookup,
                    snp_lookup=snp_lookup,
                    seq=g.seq,
                )
            )
        self._buildGlobalTables()

    def _buildGlobalTables(self) -> None:
        """Concatenated cross-gene tables for the vectorised annotate path."""
        idx = self.index
        G, Lmax = len(self.tables), idx.backbone.shape[1]
        starts = np.zeros(G + 1, dtype=np.int64)
        for gi, t in enumerate(self.tables):
            starts[gi + 1] = starts[gi] + len(t.var_ids)
        self.gvar_start = starts
        Vtot = int(starts[-1])
        self.g_pos = np.concatenate(
            [t.var_pos for t in self.tables]
        ).astype(np.int64) if Vtot else np.zeros(0, np.int64)
        self.g_is_del = np.concatenate([t.var_is_del for t in self.tables]) \
            if Vtot else np.zeros(0, bool)
        self.g_val = np.concatenate([t.var_val for t in self.tables]) \
            if Vtot else np.zeros(0, np.int64)
        self.g_in_exon = np.concatenate([t.var_in_exon for t in self.tables]) \
            if Vtot else np.zeros(0, bool)
        self.g_ignore = np.concatenate([t.var_ignore for t in self.tables]) \
            if Vtot else np.zeros(0, bool)
        self.g_ids = np.array(
            [i for t in self.tables for i in t.var_ids], dtype=object
        )
        # [G, Lmax, 4] -> global SNP idx (or -1); int32 halves the bytes
        # the [reads, RL] gather in annotateArrays touches
        self.snp_lookup_g = np.full((G, Lmax, 4), -1, dtype=np.int32)
        for gi, t in enumerate(self.tables):
            L = t.snp_lookup.shape[0]
            lk = t.snp_lookup.astype(np.int64)
            self.snp_lookup_g[gi, :L] = np.where(lk >= 0, lk + starts[gi], -1)
        # backbone bases per gene, PAD past length
        self.seq_g = idx.backbone[:G]
        # span boundary tables: lo_at[g, p] = bisect(keys, (p, 1, "A")),
        # hi_at[g, p] = bisect(keys, (p, 1, "T")) — exactly the reference's
        # getVariantsBoundary sentinels (hisat2.py:692-713)
        self.lo_at = np.zeros((G, Lmax + 2), dtype=np.int64)
        self.hi_at = np.zeros((G, Lmax + 2), dtype=np.int64)
        for gi, t in enumerate(self.tables):
            if not t.var_keys:
                self.lo_at[gi] = starts[gi]
                self.hi_at[gi] = starts[gi]
                continue
            pos = np.array([k[0] for k in t.var_keys], dtype=np.int64)
            rank = np.array([k[1] for k in t.var_keys], dtype=np.int64)
            # within rank 1 the val strings are single bases; map to a rank
            # preserving "A"<"C"<"G"<"N"<"T" so the sentinel compares work
            vord = np.zeros(len(t.var_keys), dtype=np.int64)
            order_map = {"A": 0, "C": 1, "G": 2, "N": 3, "T": 4}
            for i, k in enumerate(t.var_keys):
                if k[1] == 1:
                    vord[i] = order_map.get(k[2][:1], 5)
            packed = (pos * 8 + rank) * 8 + np.where(rank == 1, vord, 0)
            p = np.arange(Lmax + 2, dtype=np.int64)
            self.lo_at[gi] = starts[gi] + np.searchsorted(
                packed, (p * 8 + 1) * 8 + 0
            )
            self.hi_at[gi] = starts[gi] + np.searchsorted(
                packed, (p * 8 + 1) * 8 + 4
            )
        # deletion lookup: packed (gene, pos, len) -> global idx, sorted
        dkeys, dvals = [], []
        self._del_span = Lmax + 2
        maxlen = 2
        for t in self.tables:
            for (p, l) in t.del_lookup:
                maxlen = max(maxlen, l + 2)
        self._del_maxlen = maxlen
        for gi, t in enumerate(self.tables):
            for (p, l), li in t.del_lookup.items():
                dkeys.append((gi * self._del_span + p) * maxlen + l)
                dvals.append(li + starts[gi])
        dk = np.array(dkeys, dtype=np.int64)
        dv = np.array(dvals, dtype=np.int64)
        order = np.argsort(dk)
        self.del_keys = dk[order]
        self.del_vals = dv[order]

    # ------------------------------------------------------------------
    def annotateArrays(
        self,
        result: AlignResult,
        exon_only: bool = False,
        error_correction: bool = False,
    ) -> tuple[EvidenceArrays, np.ndarray, np.ndarray]:
        """Vectorised annotate: all per-read work batched as array ops
        (kills the reference's 2nd hot loop, hisat2.py:279-515, without a
        per-read Python loop).  Returns (evidence, depth, pileup).

        Semantics are identical to `annotateLoop` (the oracle): NM
        accounting, novel-SNV registration order, positive/negative span
        rules, error correction, exon_only filtering.
        """
        idx = self.index
        G, Lmax = idx.backbone.shape
        Gt = len(self.tables)
        N = len(result.gene)
        RL = result.cols_l.shape[1]
        mapped = result.gene >= 0

        # compact to mapped pairs: unmapped rows contribute nothing to any
        # output, and most device batches are padded/bucketed well past the
        # mapped count — every [rows, RL] op below shrinks accordingly
        map_pairs = np.nonzero(mapped)[0].astype(np.int64)
        Nm = len(map_pairs)
        M = 2 * N
        Mc = 2 * Nm
        # interleaved mate rows (within the compacted set): row 2i = left
        # mate of mapped pair i, row 2i+1 = right mate; `mrows` maps back
        # to the full interleaved index, and is strictly increasing, so
        # compacted row-major order == full row-major order
        mrows = np.empty(Mc, dtype=np.int64)
        mrows[0::2] = 2 * map_pairs
        mrows[1::2] = 2 * map_pairs + 1
        cols = np.empty((Mc, RL), dtype=np.int32)
        bases = np.empty((Mc, RL), dtype=np.int16)
        lens = np.empty(Mc, dtype=np.int32)
        cols[0::2], cols[1::2] = result.cols_l[map_pairs], result.cols_r[map_pairs]
        bases[0::2], bases[1::2] = result.bases_l[map_pairs], result.bases_r[map_pairs]
        lens[0::2], lens[1::2] = result.len_l[map_pairs], result.len_r[map_pairs]
        gene = np.repeat(result.gene[map_pairs].astype(np.int64), 2)

        j = np.arange(RL, dtype=np.int32)[None, :]
        in_len = j < lens[:, None]
        consumed = (cols >= 0) & in_len
        any_consumed = consumed.any(axis=1)
        overhang = ((cols == -3) & in_len).any(axis=1)
        n_ins = ((cols == -2) & in_len).sum(axis=1)

        safe_gene = gene  # compacted rows are all mapped: gene is valid
        safe_cols = np.clip(cols, 0, Lmax - 1)
        bb = self.seq_g[safe_gene[:, None], safe_cols]

        # --- error correction (reference hisat2.py:609-654): pileup over
        # all mapped pairs, then minority mismatching bases corrected.
        # Depth/pileup outputs stay raw (the reference pileups the BAM).
        bases_raw = bases
        if error_correction:
            rows, cposs = np.nonzero(consumed)
            lin = (gene[rows] * Lmax + cols[rows, cposs]) * 5 \
                + bases[rows, cposs]
            ec_pileup = np.bincount(lin, minlength=Gt * Lmax * 5) \
                .reshape(Gt, Lmax, 5).astype(np.int32)
            cand = consumed & (bases != bb) & (bases < 4)
            rows, cposs = np.nonzero(cand)
            if len(rows):
                counts = ec_pileup[gene[rows], cols[rows, cposs], :4]
                fix, maj, ton = minorityCorrection(
                    counts, bases[rows, cposs]
                )
                bases = bases.copy()
                bases[rows[fix], cposs[fix]] = maj[fix]
                bases[rows[ton], cposs[ton]] = 4

        # --- SNP classification
        mm = consumed & (bases != bb)
        n_mask = bases >= 4
        mm_snp = mm & ~n_mask
        mm_n = mm & n_mask
        snp_gidx = np.where(
            mm_snp,
            self.snp_lookup_g[
                safe_gene[:, None], safe_cols, np.clip(bases, 0, 3)
            ],
            -1,
        )
        known_mask = mm_snp & (snp_gidx >= 0)
        novel_mask = mm_snp & (snp_gidx < 0)
        novel_snp_cnt = novel_mask.sum(axis=1)
        n_pos_cnt = mm_n.sum(axis=1)
        ignored_cnt = np.where(known_mask, self.g_ignore[snp_gidx], False) \
            .sum(axis=1)

        # --- deletion runs between consecutive consumed columns
        pm = np.maximum.accumulate(np.where(consumed, cols, -1), axis=1)
        prev_before = np.concatenate(
            [np.full((Mc, 1), -1, dtype=np.int32), pm[:, :-1]], axis=1
        )
        gap = cols - prev_before - 1
        run_mask = consumed & (prev_before >= 0) & (gap > 0)
        r_rows, r_js = np.nonzero(run_mask)
        r_start0 = prev_before[r_rows, r_js] + 1
        r_len = gap[r_rows, r_js]
        r_gene = gene[r_rows]
        # canonical (left-aligned) deletion position, vectorised: shift every
        # run left while the flanking base repeats (same rule as _canonDelPos)
        r_canon = r_start0.copy()
        seq_g = self.seq_g
        for _ in range(Lmax):
            active = (r_canon > 0) & (
                seq_g[r_gene, np.maximum(r_canon - 1, 0)]
                == seq_g[r_gene, np.minimum(r_canon + r_len - 1, Lmax - 1)]
            )
            if not active.any():
                break
            r_canon[active] -= 1
        # catalog lookup: canonical key, then original-position key
        ml, span = self._del_maxlen, self._del_span

        def delFind(p, l, g):
            key = (g * span + p) * ml + np.minimum(l, ml - 1)
            i = np.searchsorted(self.del_keys, key)
            ok = (i < len(self.del_keys)) & (
                self.del_keys[np.minimum(i, len(self.del_keys) - 1)] == key
            )
            return np.where(ok, self.del_vals[np.minimum(i, len(self.del_keys) - 1)], -1) \
                if len(self.del_keys) else np.full(len(p), -1, dtype=np.int64)

        d1 = delFind(r_canon, r_len, r_gene)
        d2 = delFind(r_start0, r_len, r_gene)
        r_del_gidx = np.where(d1 >= 0, d1, d2)
        r_known = r_del_gidx >= 0
        novel_del_len = np.zeros(Mc, dtype=np.int64)
        np.add.at(novel_del_len, r_rows[~r_known], r_len[~r_known])

        # --- NM and filters
        nm = (novel_snp_cnt + n_pos_cnt + n_ins + novel_del_len
              + ignored_cnt).astype(np.int64)
        nm[~any_consumed] = 99
        evidence_empty = (n_ins > 0) | (novel_del_len > 0) | overhang
        nm2c = nm.reshape(Nm, 2).T                     # [2, Nm]
        pass_c = (nm2c <= self.num_editdist).all(axis=0)
        pass_mask = np.zeros(N, dtype=bool)
        pass_mask[map_pairs] = pass_c
        nm2 = np.zeros((2, N), dtype=np.int64)
        nm2[:, map_pairs] = nm2c

        # --- novel SNV registration: first occurrence in row-major (read,
        # mate, column) order, matching the reference's sequential nv ids
        reg_mask = novel_mask & ~evidence_empty[:, None]
        nrows, njs = np.nonzero(reg_mask)
        npos = cols[nrows, njs]
        nbase = bases[nrows, njs]
        nkey = (gene[nrows] * Lmax + npos) * 4 + nbase
        uniq_keys, first_idx, inverse = np.unique(
            nkey, return_index=True, return_inverse=True
        )
        order = np.argsort(first_idx, kind="stable")
        rank_of_uniq = np.empty(len(uniq_keys), dtype=np.int64)
        rank_of_uniq[order] = np.arange(len(uniq_keys))
        Vtot = self.gvar_start[-1]
        novel_gidx_inst = Vtot + rank_of_uniq[inverse]   # per instance
        novel_variants: list[Variant] = []
        novel_ids = IdAllocator()
        ids_all = np.concatenate(
            [self.g_ids, np.empty(len(uniq_keys), dtype=object)]
        )
        for u in order:
            key = int(uniq_keys[u])
            b = key % 4
            p = (key // 4) % Lmax
            gi = key // (4 * Lmax)
            v = Variant(
                pos=int(p), typ="single", ref=self.tables[gi].name,
                val="ACGT"[b], id=novel_ids.nextNovel(),
            )
            novel_variants.append(v)
        for i, v in enumerate(novel_variants):
            ids_all[Vtot + i] = str(v.id)

        # --- positives CSR: known SNPs (column order), known deletions
        # (run order), then novel SNVs (column order) — the loop's order
        pass_row = np.repeat(pass_c, 2) & ~evidence_empty
        ksel = known_mask & pass_row[:, None]
        if exon_only:
            ksel &= self.g_in_exon[np.clip(snp_gidx, 0, max(Vtot - 1, 0))]
        krows, kjs = np.nonzero(ksel)
        k_gidx = snp_gidx[krows, kjs]
        dsel = r_known & pass_row[r_rows]
        if exon_only:
            dsel &= self.g_in_exon[np.clip(r_del_gidx, 0, max(Vtot - 1, 0))]
        d_rows = r_rows[dsel]
        d_gidx = r_del_gidx[dsel]
        if exon_only:
            # novel variants default in_exon=False in the reference, so
            # exon_only drops them from positives (hisat2.py:775-790)
            v_rows = np.zeros(0, dtype=np.int64)
            v_gidx = np.zeros(0, dtype=np.int64)
        else:
            v_rows = nrows[pass_row[nrows]]
            v_gidx = novel_gidx_inst[pass_row[nrows]]
        pos_indptr, pos_idx = _csrConcat(
            M,
            [
                (mrows[krows], k_gidx),
                (mrows[d_rows], d_gidx),
                (mrows[v_rows], v_gidx),
            ],
        )

        # --- negatives CSR: catalog span [lo, hi) minus positives, N-site
        # SNPs and deletions reaching the read end
        first_col = np.where(
            any_consumed, np.argmax(consumed, axis=1), 0
        )
        left = cols[np.arange(Mc), first_col]
        last_col = RL - 1 - np.argmax(consumed[:, ::-1], axis=1)
        right = cols[np.arange(Mc), last_col] + 1
        do_neg = pass_row & any_consumed
        lo = np.where(do_neg, self.lo_at[safe_gene, np.clip(left, 0, Lmax + 1)], 0)
        hi = np.where(do_neg, self.hi_at[safe_gene, np.clip(right, 0, Lmax + 1)], 0)
        hi = np.maximum(hi, lo)
        counts = (hi - lo).astype(np.int64)
        cand_rows = np.repeat(np.arange(Mc), counts)
        base_off = np.concatenate([[0], np.cumsum(counts)])[:-1]
        cand_gidx = (
            np.arange(len(cand_rows)) - np.repeat(base_off, counts)
            + np.repeat(lo, counts)
        )
        keep = np.ones(len(cand_rows), dtype=bool)
        Vbig = np.int64(max(Vtot, 1))
        # exclude positives (catalog ones only — novel ids are outside the
        # [lo, hi) catalog span; the loop's pos_set is likewise built from
        # the exon-filtered known sets)
        pr = np.concatenate([krows, d_rows])
        pg = np.concatenate([k_gidx, d_gidx])
        keep &= ~np.isin(cand_rows * Vbig + cand_gidx, pr * Vbig + pg)
        # exclude SNPs at N columns
        nr2, nj2 = np.nonzero(mm_n & pass_row[:, None])
        ncols_keys = nr2 * np.int64(Lmax + 1) + cols[nr2, nj2]
        cand_is_del = self.g_is_del[cand_gidx] if Vtot else np.zeros(0, bool)
        cand_pos = self.g_pos[cand_gidx] if Vtot else np.zeros(0, np.int64)
        snp_at_n = ~cand_is_del & np.isin(
            cand_rows * np.int64(Lmax + 1) + cand_pos, ncols_keys
        )
        keep &= ~snp_at_n
        # exclude deletions reaching the read end
        cand_val = self.g_val[cand_gidx] if Vtot else np.zeros(0, np.int64)
        right_of = right[cand_rows]
        keep &= ~(cand_is_del & (cand_pos + cand_val + 10 >= right_of))
        if exon_only:
            keep &= self.g_in_exon[cand_gidx]
        neg_rows = cand_rows[keep]
        neg_gidx = cand_gidx[keep]
        neg_counts_full = np.zeros(M, dtype=np.int64)
        neg_counts_full[mrows] = np.bincount(neg_rows, minlength=Mc)
        neg_indptr = np.concatenate([[0], np.cumsum(neg_counts_full)])

        # --- depth / pileup from passing, unique-mapped pairs
        uniq_row = np.repeat(pass_c & (result.nh[map_pairs] == 1), 2)
        sel = consumed & uniq_row[:, None]
        rows, cposs = np.nonzero(sel)
        lin = (gene[rows] * Lmax + cols[rows, cposs]) * 5 \
            + bases_raw[rows, cposs]
        pileup = np.bincount(lin, minlength=Gt * Lmax * 5) \
            .reshape(Gt, Lmax, 5).astype(np.int32)
        depth = pileup.sum(axis=-1, dtype=np.int32)

        ev = EvidenceArrays(
            gene=result.gene.astype(np.int32),
            nh=result.nh.astype(np.int32),
            nm=nm2.astype(np.int32),
            pass_mask=pass_mask,
            pos_indptr=pos_indptr,
            pos_idx=pos_idx,
            neg_indptr=neg_indptr,
            neg_idx=neg_gidx,
            ids=ids_all,
            novel_variants=novel_variants,
            n_catalog=int(Vtot),
        )
        logger.info(
            f"[Align] pairs mapped {int(mapped.sum())}, "
            f"passed NM filter {int(pass_mask.sum())}, "
            f"unique {int((pass_mask & (result.nh == 1)).sum())}"
        )
        return ev, depth, pileup

    # ------------------------------------------------------------------
    # native path: the C++ classification core (native/annotate.cpp)
    # with persistent arenas — same contract as annotateArrays, asserted
    # equal in tests/test_native_annotate.py
    # ------------------------------------------------------------------

    def _nativeTables(self):
        if hasattr(self, "_nt"):
            return self._nt
        import ctypes

        from ..native_io import _loadLib

        lib = _loadLib()
        if lib is None or not hasattr(lib, "kgt_annotate"):
            self._nt = None
            return None
        lib.kgt_annotate.restype = ctypes.c_long
        u8 = np.uint8
        self._nt = {
            "lib": lib,
            "seq_g": np.ascontiguousarray(self.seq_g, dtype=np.int8),
            "snp": np.ascontiguousarray(self.snp_lookup_g, dtype=np.int32),
            "ignore": np.ascontiguousarray(self.g_ignore, dtype=u8),
            "in_exon": np.ascontiguousarray(self.g_in_exon, dtype=u8),
            "is_del": np.ascontiguousarray(self.g_is_del, dtype=u8),
            "pos": np.ascontiguousarray(self.g_pos, dtype=np.int64),
            "val": np.ascontiguousarray(self.g_val, dtype=np.int64),
            "lo": np.ascontiguousarray(self.lo_at, dtype=np.int64),
            "hi": np.ascontiguousarray(self.hi_at, dtype=np.int64),
            "dk": np.ascontiguousarray(self.del_keys, dtype=np.int64),
            "dv": np.ascontiguousarray(self.del_vals, dtype=np.int64),
            # adaptive output arenas, persistent across calls (page-fault
            # churn on this class of host is the enemy)
            "pos_cap": 1 << 20,
            "neg_cap": 1 << 21,
            "novel_cap": 1 << 16,
            "bufs": {},
        }
        return self._nt

    def _arena(self, nt, key, shape, dtype):
        import threading

        k = (key, threading.get_ident())
        buf = nt["bufs"].get(k)
        n = int(np.prod(shape))
        if buf is None or buf.size < n:
            buf = np.empty(max(n, 1), dtype=dtype)
            nt["bufs"][k] = buf
        return buf[:n].reshape(shape)

    def annotateArraysNative(
        self,
        result: AlignResult,
        exon_only: bool = False,
        error_correction: bool = False,
    ) -> tuple[EvidenceArrays, np.ndarray, np.ndarray]:
        import ctypes

        nt = self._nativeTables()
        assert nt is not None
        idx = self.index
        Gt = len(self.tables)
        _, Lmax = idx.backbone.shape
        N = len(result.gene)
        M = 2 * N
        Vtot = int(self.gvar_start[-1])
        map_pairs = np.ascontiguousarray(
            np.nonzero(result.gene >= 0)[0], dtype=np.int64
        )
        Nm = len(map_pairs)

        def ptr(a, ct):
            return a.ctypes.data_as(ctypes.POINTER(ct))

        cols_l = np.ascontiguousarray(result.cols_l, dtype=np.int32)
        cols_r = np.ascontiguousarray(result.cols_r, dtype=np.int32)
        bases_l = np.ascontiguousarray(result.bases_l, dtype=np.int8)
        bases_r = np.ascontiguousarray(result.bases_r, dtype=np.int8)
        len_l = np.ascontiguousarray(result.len_l, dtype=np.int32)
        len_r = np.ascontiguousarray(result.len_r, dtype=np.int32)
        gene32 = np.ascontiguousarray(result.gene, dtype=np.int32)
        nh32 = np.ascontiguousarray(result.nh, dtype=np.int32)

        nm_out = self._arena(nt, "nm", (2 * max(Nm, 1),), np.int32)
        pass_out = self._arena(nt, "pass", (max(Nm, 1),), np.uint8)
        pos_cnt = self._arena(nt, "pcnt", (2 * max(Nm, 1),), np.int64)
        neg_cnt = self._arena(nt, "ncnt", (2 * max(Nm, 1),), np.int64)
        pileup_flat = self._arena(nt, "pileup", (Gt * Lmax * 5,), np.int32)
        n_novel = np.zeros(1, dtype=np.int64)

        while True:
            pileup_flat[:] = 0  # re-zero: retries would double-count
            pos_vals = self._arena(nt, "pvals", (nt["pos_cap"],), np.int64)
            neg_vals = self._arena(nt, "nvals", (nt["neg_cap"],), np.int64)
            novel_keys = self._arena(
                nt, "nkeys", (nt["novel_cap"],), np.int64
            )
            if Nm == 0:
                need = 0
                break
            need = nt["lib"].kgt_annotate(
                ctypes.c_int64(Nm), ctypes.c_int32(cols_l.shape[1]),
                ctypes.c_int32(Gt), ctypes.c_int64(Lmax),
                ctypes.c_int64(Vtot), ctypes.c_int32(self.num_editdist),
                ctypes.c_int32(int(exon_only)),
                ctypes.c_int32(int(error_correction)),
                ptr(map_pairs, ctypes.c_int64),
                ptr(cols_l, ctypes.c_int32), ptr(bases_l, ctypes.c_int8),
                ptr(len_l, ctypes.c_int32),
                ptr(cols_r, ctypes.c_int32), ptr(bases_r, ctypes.c_int8),
                ptr(len_r, ctypes.c_int32),
                ptr(gene32, ctypes.c_int32), ptr(nh32, ctypes.c_int32),
                ptr(nt["seq_g"], ctypes.c_int8),
                ptr(nt["snp"], ctypes.c_int32),
                ptr(nt["ignore"], ctypes.c_uint8),
                ptr(nt["in_exon"], ctypes.c_uint8),
                ptr(nt["is_del"], ctypes.c_uint8),
                ptr(nt["pos"], ctypes.c_int64),
                ptr(nt["val"], ctypes.c_int64),
                ptr(nt["lo"], ctypes.c_int64), ptr(nt["hi"], ctypes.c_int64),
                ptr(nt["dk"], ctypes.c_int64), ptr(nt["dv"], ctypes.c_int64),
                ctypes.c_int64(len(nt["dk"])),
                ctypes.c_int64(self._del_span),
                ctypes.c_int64(self._del_maxlen),
                ptr(nm_out, ctypes.c_int32), ptr(pass_out, ctypes.c_uint8),
                ptr(pos_cnt, ctypes.c_int64),
                ptr(pos_vals, ctypes.c_int64),
                ctypes.c_int64(nt["pos_cap"]),
                ptr(neg_cnt, ctypes.c_int64),
                ptr(neg_vals, ctypes.c_int64),
                ctypes.c_int64(nt["neg_cap"]),
                ptr(novel_keys, ctypes.c_int64),
                ctypes.c_int64(nt["novel_cap"]),
                ptr(n_novel, ctypes.c_int64),
                ptr(pileup_flat, ctypes.c_int32),
            )
            if need == 0:
                break
            for cap in ("pos_cap", "neg_cap", "novel_cap"):
                if need > nt[cap] // 2:
                    nt[cap] = max(nt[cap] * 2, int(need) + 1)

        # --- assemble the EvidenceArrays contract
        mrows = np.empty(2 * Nm, dtype=np.int64)
        mrows[0::2] = 2 * map_pairs
        mrows[1::2] = 2 * map_pairs + 1
        nm2 = np.zeros((2, N), dtype=np.int32)
        pass_mask = np.zeros(N, dtype=bool)
        if Nm:
            nm2[:, map_pairs] = nm_out.reshape(Nm, 2).T
            pass_mask[map_pairs] = pass_out.astype(bool)
        counts_full = np.zeros(M, dtype=np.int64)
        if Nm:
            counts_full[mrows] = pos_cnt
        pos_indptr = np.concatenate([[0], np.cumsum(counts_full)])
        counts_full = np.zeros(M, dtype=np.int64)
        if Nm:
            counts_full[mrows] = neg_cnt
        neg_indptr = np.concatenate([[0], np.cumsum(counts_full)])
        P = int(pos_indptr[-1])
        Q = int(neg_indptr[-1])

        U = int(n_novel[0])
        novel_variants: list[Variant] = []
        novel_ids = IdAllocator()
        ids_all = np.concatenate(
            [self.g_ids, np.empty(U, dtype=object)]
        )
        for u in range(U):
            key = int(novel_keys[u])
            b = key % 4
            p = (key // 4) % Lmax
            gi = key // (4 * Lmax)
            v = Variant(
                pos=int(p), typ="single", ref=self.tables[gi].name,
                val="ACGT"[b], id=novel_ids.nextNovel(),
            )
            novel_variants.append(v)
            ids_all[Vtot + u] = str(v.id)

        pileup = pileup_flat.reshape(Gt, Lmax, 5).copy()
        depth = pileup.sum(axis=-1, dtype=np.int32)
        ev = EvidenceArrays(
            gene=result.gene.astype(np.int32),
            nh=result.nh.astype(np.int32),
            nm=nm2,
            pass_mask=pass_mask,
            pos_indptr=pos_indptr,
            pos_idx=pos_vals[:P].copy(),
            neg_indptr=neg_indptr,
            neg_idx=neg_vals[:Q].copy(),
            ids=ids_all,
            novel_variants=novel_variants,
            n_catalog=Vtot,
        )
        logger.info(
            f"[Align] pairs mapped {Nm}, "
            f"passed NM filter {int(pass_mask.sum())}, "
            f"unique {int((pass_mask & (result.nh == 1)).sum())}"
        )
        return ev, depth, pileup

    def catalogVariants(self) -> list:
        """Concatenated per-gene catalog Variant list (cached)."""
        v = getattr(self, "_catalog_variants", None)
        if v is None:
            v = []
            for t in self.tables:
                v.extend(self.index.genes[t.name].variants)
            self._catalog_variants = v
        return list(v)

    def evidenceBundle(self, ev: EvidenceArrays):
        """EvidenceArrays + matching variant list -> the typing-ready
        array bundle (typing/evidence.py)."""
        from ..typing.evidence import EvidenceBundle

        return EvidenceBundle(
            ev,
            self.catalogVariants() + ev.novel_variants,
            [t.name for t in self.tables],
        )

    def toPairReads(self, ev: EvidenceArrays) -> list[PairRead]:
        """EvidenceArrays -> PairRead list (only at JSON/compat
        boundaries; the product path hands typing the array bundle)."""
        return self.evidenceBundle(ev).toReadsData()["reads"]

    def _impl(self):
        """The active array-annotate implementation: the native C++ core
        when built, else the numpy oracle (KGT_NO_NATIVE=1 forces it).
        Shared with the streaming driver so both paths dispatch
        identically."""
        import os

        use_native = (
            not os.environ.get("KGT_NO_NATIVE")
            and self._nativeTables() is not None
        )
        return self.annotateArraysNative if use_native else self.annotateArrays

    def assembleReadsData(
        self, ev: EvidenceArrays, depth, pileup
    ) -> tuple[dict, np.ndarray, np.ndarray, np.ndarray]:
        """EvidenceArrays -> the product contract (reads+variants dict,
        depth, pileup, pass mask).  Shared by annotate() and the
        streaming driver."""
        variants = self.catalogVariants() + ev.novel_variants
        reads = self.toPairReads(ev)
        return (
            {"variants": variants, "reads": reads},
            depth,
            pileup,
            ev.pass_mask,
        )

    def annotateEvidence(
        self,
        result: AlignResult,
        exon_only: bool = False,
        error_correction: bool = False,
    ) -> tuple[EvidenceArrays, np.ndarray, np.ndarray]:
        """Product-path endpoint: per-read variant evidence (novel SNVs
        registered), depth and pileup — all in array form.  Typing, CN
        and the JSON export all consume this; PairRead objects are built
        only at the JSON/compat boundary (`assembleReadsData`)."""
        return self._impl()(
            result, exon_only=exon_only, error_correction=error_correction
        )

    def annotate(
        self,
        result: AlignResult,
        exon_only: bool = False,
        error_correction: bool = False,
    ) -> tuple[dict, np.ndarray, np.ndarray, np.ndarray]:
        """Compat path; same contract as `annotateLoop`.  Uses the native
        C++ core when built (KGT_NO_NATIVE=1 forces the numpy oracle)."""
        ev, depth, pileup = self.annotateEvidence(
            result, exon_only=exon_only, error_correction=error_correction
        )
        return self.assembleReadsData(ev, depth, pileup)

    # ------------------------------------------------------------------
    def annotateLoop(
        self,
        result: AlignResult,
        exon_only: bool = False,
        error_correction: bool = False,
    ) -> tuple[dict, np.ndarray, np.ndarray, np.ndarray]:
        """-> (ReadsAndVariantsData, depth [G, Lmax], pileup [G, Lmax, 5],
               pass_mask [N])

        pass_mask mirrors the reference read filter: concordantly mapped
        and NM <= num_editdist on both mates (hisat2.py:541-578).  Pairs
        with novel indels stay in depth but contribute empty variant lists
        (hisat2.py:746-754).

        error_correction=True applies the pileup-based minority-base
        correction of reference hisat2.py:609-654 before variant
        classification: at columns with depth >= 20 where the read's base
        is <20% of the pileup, the base is replaced by the >=80% majority
        (or N when there is none).
        """
        idx = self.index
        G, Lmax = idx.backbone.shape
        N = len(result.gene)
        mapped = result.gene >= 0

        # per-mate vectorised masks
        mate_data = []
        for cols, bases, lens in (
            (result.cols_l, result.bases_l, result.len_l),
            (result.cols_r, result.bases_r, result.len_r),
        ):
            in_len = np.arange(cols.shape[1])[None, :] < lens[:, None]
            consumed = (cols >= 0) & in_len & mapped[:, None]
            ins = (cols == -2) & in_len & mapped[:, None]
            safe_cols = np.clip(cols, 0, Lmax - 1)
            safe_gene = np.clip(result.gene, 0, G - 1)
            bb = idx.backbone[safe_gene[:, None], safe_cols]
            mismatch = consumed & (bases != bb)
            mate_data.append(
                {
                    "cols": cols,
                    "bases": bases,
                    "consumed": consumed,
                    "ins": ins,
                    "mismatch": mismatch,
                    "lens": lens,
                }
            )

        reads: list[PairRead] = []
        novel_ids = IdAllocator()
        novel_map: dict[tuple, Variant] = {}
        pass_mask = np.zeros(N, dtype=bool)
        nm = np.zeros((2, N), dtype=np.int32)

        # pileup over all mapped pairs (the reference pileups the raw BAM
        # before filtering, hisat2.py:927); used for error correction
        ec_pileup = None
        if error_correction:
            ec_pileup = np.zeros((G, Lmax, 5), dtype=np.int32)
            for md in mate_data:
                rows, cposs = np.nonzero(md["consumed"])
                np.add.at(
                    ec_pileup,
                    (
                        result.gene[rows],
                        md["cols"][rows, cposs],
                        md["bases"][rows, cposs],
                    ),
                    1,
                )

        # host loop over mapped pairs; per-mate work is tiny slices
        for n in np.nonzero(mapped)[0]:
            gi = result.gene[n]
            t = self.tables[gi]
            ok = True
            per_mate = []
            for m, md in enumerate(mate_data):
                info = self._annotateMate(
                    t, md["cols"][n], md["bases"][n], int(md["lens"][n]),
                    novel_ids, novel_map,
                    ec_pileup[gi] if ec_pileup is not None else None,
                    exon_only=exon_only,
                )
                nm[m, n] = info["nm"]
                if info["nm"] > self.num_editdist:
                    ok = False
                per_mate.append(info)
            if not ok:
                continue
            pass_mask[n] = True
            reads.append(
                PairRead(
                    backbone=t.name,
                    multiple=int(result.nh[n]),
                    lpv=per_mate[0]["pos_ids"],
                    lnv=per_mate[0]["neg_ids"],
                    rpv=per_mate[1]["pos_ids"],
                    rnv=per_mate[1]["neg_ids"],
                    pair_index=int(n),
                )
            )

        # depth / pileup from passing, unique-mapped pairs
        depth = np.zeros((G, Lmax), dtype=np.int32)
        pileup = np.zeros((G, Lmax, 5), dtype=np.int32)
        uniq = pass_mask & (result.nh == 1)
        for md in mate_data:
            sel = md["consumed"] & uniq[:, None]
            rows, cposs = np.nonzero(sel)
            genes = result.gene[rows]
            cols = md["cols"][rows, cposs]
            np.add.at(depth, (genes, cols), 1)
            np.add.at(pileup, (genes, cols, md["bases"][rows, cposs]), 1)

        # collect variant catalog + novel variants
        variants: list[Variant] = []
        for t in self.tables:
            variants.extend(self.index.genes[t.name].variants)
        variants.extend(novel_map.values())

        logger.info(
            f"[Align] pairs mapped {int(mapped.sum())}, "
            f"passed NM filter {int(pass_mask.sum())}, "
            f"unique {int(uniq.sum())}"
        )
        return (
            {"variants": variants, "reads": reads},
            depth,
            pileup,
            pass_mask,
        )

    # ------------------------------------------------------------------
    def _annotateMate(
        self,
        t: GeneTables,
        cols: np.ndarray,
        bases: np.ndarray,
        read_len: int,
        novel_ids: IdAllocator,
        novel_map: dict,
        gene_pileup: np.ndarray | None = None,
        exon_only: bool = False,
    ) -> dict:
        """One mate -> NM + positive/negative variant id lists."""
        cols = cols[:read_len]
        bases = bases[:read_len]
        consumed = cols >= 0
        if not consumed.any():
            return {"nm": 99, "pos_ids": [], "neg_ids": []}
        # -3 = consumed outside the reference (read overhangs a gene
        # boundary): the reference discards soft-clipped reads' evidence
        # (hisat2.py:681-684); same here — NM from in-range edits only
        overhang = bool((cols == -3).any())
        ccols = cols[consumed]
        cbases = bases[consumed]

        if gene_pileup is not None:
            # minority-base correction (reference hisat2.py:609-654):
            # only mismatching bases are candidates
            bb0 = t.seq[ccols]
            cand = np.nonzero((cbases != bb0) & (cbases < 4))[0]
            if len(cand):
                fix, maj, ton = minorityCorrection(
                    gene_pileup[ccols[cand], :4], cbases[cand]
                )
                if fix.any() or ton.any():
                    cbases = cbases.copy()
                    cbases[cand[fix]] = maj[fix]
                    # no clear majority: mark as N (excluded downstream)
                    cbases[cand[ton]] = 4

        # novel insertion in read?
        has_ins = bool((cols == -2).any())
        n_ins = int((cols == -2).sum())

        # deletion runs between consecutive consumed columns
        gaps = np.diff(ccols) - 1
        run_starts = ccols[:-1][gaps > 0] + 1
        run_lens = gaps[gaps > 0]

        # SNPs
        bb = t.seq[ccols]
        mm = cbases != bb
        n_mask = cbases >= 4
        mm_pos = ccols[mm & ~n_mask]
        mm_base = cbases[mm & ~n_mask]
        snp_idx = t.snp_lookup[mm_pos, mm_base]
        known_snp = snp_idx[snp_idx >= 0]
        novel_snp_pos = mm_pos[snp_idx < 0]
        novel_snp_base = mm_base[snp_idx < 0]
        n_pos_cols = ccols[mm & n_mask]
        # rare (ignored) SNPs are outside the alignment graph, so hisat2
        # counts them in NM even though they are catalogued (typing still
        # records them as positives)
        n_ignored_snp = int(t.var_ignore[known_snp].sum())

        # deletions: match catalog via canonical position
        known_del = []
        novel_del_len = 0
        for s, l in zip(run_starts, run_lens):
            canon = _canonDelPos(t.seq, int(s), int(l))
            li = t.del_lookup.get((canon, int(l)))
            if li is None:
                li = t.del_lookup.get((int(s), int(l)))
            if li is not None:
                known_del.append(li)
            else:
                novel_del_len += int(l)

        nm = int(
            len(novel_snp_pos) + len(n_pos_cols) + n_ins + novel_del_len
            + n_ignored_snp
        )

        # novel indel / boundary overhang => discard evidence
        # (reference hisat2.py:746-754 and soft-clip rule 681-684)
        if has_ins or novel_del_len or overhang:
            return {"nm": nm, "pos_ids": [], "neg_ids": []}

        # register novel SNVs (shared nv ids across reads)
        novel_local_ids = []
        for p, b in zip(novel_snp_pos, novel_snp_base):
            key = (t.name, int(p), "ACGT"[b])
            v = novel_map.get(key)
            if v is None:
                v = Variant(
                    pos=int(p),
                    typ="single",
                    ref=t.name,
                    val="ACGT"[b],
                    id=novel_ids.nextNovel(),
                )
                novel_map[key] = v
            novel_local_ids.append(str(v.id))

        # exon-only mode keeps only exon-region catalogued variants
        # (reference getPNFromVariantList exon_only, hisat2.py:775-790)
        if exon_only:
            known_snp = known_snp[t.var_in_exon[known_snp]]
            known_del = [i for i in known_del if t.var_in_exon[i]]
            # novel variants default in_exon=False in the reference, so
            # exon_only drops them from positives (hisat2.py:775-790)
            novel_local_ids = []
        pos_ids = [t.var_ids[i] for i in known_snp] + [
            t.var_ids[i] for i in known_del
        ] + novel_local_ids

        # negatives: catalogued variants inside the read span, minus
        # positives, N-site SNPs and deletions reaching the read end
        left = int(ccols[0])
        right = int(ccols[-1]) + 1
        lo = bisect.bisect_left(t.var_keys, (left, 1, "A"))
        hi = bisect.bisect_left(t.var_keys, (right, 1, "T"))
        pos_set = set(known_snp) | set(known_del)
        n_cols_set = set(int(c) for c in n_pos_cols)
        neg_ids = []
        for i in range(lo, hi):
            if i in pos_set:
                continue
            if exon_only and not t.var_in_exon[i]:
                continue
            p = int(t.var_pos[i])
            if t.var_is_del[i]:
                if p + int(t.var_val[i]) + 10 >= right:
                    continue
            else:
                if p in n_cols_set:
                    continue
            neg_ids.append(t.var_ids[i])
        return {"nm": nm, "pos_ids": pos_ids, "neg_ids": neg_ids}
