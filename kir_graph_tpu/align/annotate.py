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

    # ------------------------------------------------------------------
    def annotate(
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
                counts = gene_pileup[ccols[cand]]         # [k, 5]
                totals = counts[:, :4].sum(axis=1)
                frac = counts[:, :4] / np.maximum(totals[:, None], 1)
                own = frac[np.arange(len(cand)), cbases[cand]]
                minority = (totals >= 20) & (own <= 0.2)
                if minority.any():
                    cbases = cbases.copy()
                    maj = frac.argmax(axis=1)
                    has_major = frac.max(axis=1) >= 0.8
                    fix = cand[minority & has_major]
                    cbases[fix] = maj[minority & has_major]
                    # no clear majority: mark as N (excluded downstream)
                    cbases[cand[minority & ~has_major]] = 4

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
