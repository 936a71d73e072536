"""
HPRC-style multi-resolution evaluation (CDS-aware precision/recall).

Lean port of the logic in reference research/kg_eval_hprc_alldigit.py:
predictions and long-read-derived truth are compared at 3/5/7-digit
resolution, where truth entries may carry annotation symbols (#/=/$/+/~)
and fusion markers ('e' + digits); truth below the target resolution is
excluded from the denominator rather than counted wrong.

Classification per the reference header:
  pred>=n, gt>=n, match           -> TP
  pred>=n, gt>=n, mismatch        -> FP
  pred>=n, gt<n, prefix match     -> excluded
  pred>=n, gt<n, prefix mismatch  -> FP
  pred<n                          -> excluded
  unmatched pred>=n               -> FP; unmatched pred<n -> excluded
  gt fusion                       -> excluded (paired pred>=n counts FP)
"""
from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd

from ..utils import getGeneName, logger


def isFusionAllele(allele: str) -> bool:
    return bool(re.search(r"e\d", allele))


def allelePartBeforeFusion(allele: str) -> str:
    if "*" in allele:
        allele = allele.split("*", 1)[1]
    m = re.search(r"e\d", allele)
    return allele[: m.start()] if m else allele


def digitLength(allele: str) -> int:
    return len(re.sub(r"\D", "", allelePartBeforeFusion(allele)))


def truncateAllele(allele: str, n_digits: int) -> str:
    digits = re.sub(r"\D", "", allelePartBeforeFusion(allele))
    return digits[:n_digits]


def readHprcTruth(tsv_file: str) -> dict[str, list[str]]:
    """`id  haplos  alleles  name` rows -> {sample: [allele, ...]}."""
    df = pd.read_csv(tsv_file, sep="\t", dtype=str)
    return {
        str(r.id): str(r.alleles).split("_") for r in df.itertuples()
    }


@dataclass
class DigitCounts:
    tp: int = 0
    fp: int = 0
    fn: int = 0
    excluded: int = 0

    @property
    def precision(self) -> float:
        return self.tp / max(self.tp + self.fp, 1)

    @property
    def recall(self) -> float:
        return self.tp / max(self.tp + self.fn, 1)

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / max(p + r, 1e-12)


def _evalGene(pred: list[str], truth: list[str], n: int, out: DigitCounts) -> None:
    pred_p = [(truncateAllele(p, n), digitLength(p)) for p in pred]
    gt_p = [
        (truncateAllele(g, n), digitLength(g), isFusionAllele(g)) for g in truth
    ]
    used_p: set[int] = set()
    used_g: set[int] = set()

    # pass 1: both >= n, exact truncated match
    for gi, (gv, gl, gf) in enumerate(gt_p):
        if gl < n or gf:
            continue
        for pi, (pv, pl) in enumerate(pred_p):
            if pi in used_p or pl < n:
                continue
            if pv == gv:
                used_p.add(pi)
                used_g.add(gi)
                out.tp += 1
                break

    # pass 2: prefix matches where truth is below resolution -> excluded
    for gi, (gv, gl, gf) in enumerate(gt_p):
        if gi in used_g or gl >= n:
            continue
        for pi, (pv, pl) in enumerate(pred_p):
            if pi in used_p:
                continue
            if pl >= n and pv.startswith(gv):
                used_p.add(pi)
                used_g.add(gi)
                out.excluded += 1
                break

    # pass 3: pair leftovers within the gene (mismatches)
    rem_g = [i for i in range(len(gt_p)) if i not in used_g]
    rem_p = [i for i in range(len(pred_p)) if i not in used_p]
    for gi, pi in zip(rem_g, rem_p):
        gv, gl, gf = gt_p[gi]
        pv, pl = pred_p[pi]
        used_g.add(gi)
        used_p.add(pi)
        if gf:
            if pl >= n:
                out.fp += 1
            else:
                out.excluded += 1
            continue
        if pl < n:
            out.excluded += 1
            if gl >= n:
                out.fn += 1
            continue
        out.fp += 1
        if gl >= n:
            out.fn += 1

    # unmatched leftovers
    for gi in range(len(gt_p)):
        if gi in used_g:
            continue
        gv, gl, gf = gt_p[gi]
        if gf or gl < n:
            out.excluded += 1
        else:
            out.fn += 1
    for pi in range(len(pred_p)):
        if pi in used_p:
            continue
        pv, pl = pred_p[pi]
        if pl >= n:
            out.fp += 1
        else:
            out.excluded += 1


# novel-filter levels (reference kg_eval_hprc_remove_novel.py:92-109):
# 0 = fusion genes only; 3 = + novel-CDS '#'; 5 = + CDS-only '+' and
# synonymous '='; 7 = + non-CDS '$'
FILTER_LEVELS = (0, 3, 5, 7)


def excludedGenesForSample(
    truth_alleles: list[str], filter_level: int
) -> set[str]:
    """Genes whose truth carries novel symbols at/below the filter level
    (reference kg_eval_hprc_remove_novel.py:248-286).  A fusion allele
    excludes both the carrying gene and every fusion partner."""
    excluded: set[str] = set()
    for allele in truth_alleles:
        gene = getGeneName(allele)
        if filter_level >= 0 and isFusionAllele(allele):
            excluded.add(gene)
            for part in allele.split("e")[1:]:
                if "*" in part:
                    excluded.add("KIR" + part.split("*")[0])
        if filter_level >= 3 and "#" in allele:
            excluded.add(gene)
        if filter_level >= 5 and ("+" in allele or "=" in allele):
            excluded.add(gene)
        if filter_level >= 7 and "$" in allele:
            excluded.add(gene)
    return excluded


def evaluateHprc(
    truth: dict[str, list[str]],
    predictions: dict[str, list[str]],
    digits: tuple[int, ...] = (3, 5, 7),
    filter_level: int | None = None,
) -> pd.DataFrame:
    """Per-gene, per-resolution precision/recall/F1 table.

    With ``filter_level`` set, genes carrying novel truth symbols at that
    level are removed per sample from BOTH truth and predictions before
    grading (the reference's remove-novel mode,
    kg_eval_hprc_remove_novel.py:464-560)."""
    rows = []
    genes = sorted(
        {getGeneName(a) for alleles in truth.values() for a in alleles}
    )
    sample_excluded = {
        sid: (
            excludedGenesForSample(alleles, filter_level)
            if filter_level is not None
            else set()
        )
        for sid, alleles in truth.items()
    }
    for n in digits:
        total = DigitCounts()
        for gene in genes:
            counts = DigitCounts()
            for sid, gt_alleles in truth.items():
                if sid not in predictions:
                    continue
                if gene in sample_excluded[sid]:
                    continue
                gt = [a for a in gt_alleles if getGeneName(a) == gene]
                pr = [
                    a
                    for a in predictions[sid]
                    if getGeneName(a.rstrip("e")) == gene
                ]
                if not gt and not pr:
                    continue
                _evalGene(pr, gt, n, counts)
            rows.append(
                {
                    "digits": n,
                    "gene": gene,
                    "tp": counts.tp,
                    "fp": counts.fp,
                    "fn": counts.fn,
                    "excluded": counts.excluded,
                    "precision": counts.precision,
                    "recall": counts.recall,
                    "f1": counts.f1,
                }
            )
            total.tp += counts.tp
            total.fp += counts.fp
            total.fn += counts.fn
            total.excluded += counts.excluded
        rows.append(
            {
                "digits": n,
                "gene": "ALL",
                "tp": total.tp,
                "fp": total.fp,
                "fn": total.fn,
                "excluded": total.excluded,
                "precision": total.precision,
                "recall": total.recall,
                "f1": total.f1,
            }
        )
        logger.info(
            f"[Eval] HPRC {n}-digit: P={total.precision:.3f} "
            f"R={total.recall:.3f} F1={total.f1:.3f}"
        )
    df = pd.DataFrame(rows)
    if filter_level is not None:
        df["filter_level"] = filter_level
    return df


def evaluateHprcRemoveNovel(
    truth: dict[str, list[str]],
    predictions: dict[str, list[str]],
    digits: tuple[int, ...] = (3, 5, 7),
    filter_levels: tuple[int, ...] = FILTER_LEVELS,
) -> pd.DataFrame:
    """Remove-novel sweep: one evaluation per filter level (the
    reference's per-level summary loop,
    kg_eval_hprc_remove_novel.py:614-737)."""
    return pd.concat(
        [
            evaluateHprc(truth, predictions, digits, filter_level=lvl)
            for lvl in filter_levels
        ],
        ignore_index=True,
    )


def compareCohortIgnoreNovel(
    truth: dict[str, list[str]],
    predictions: dict[str, list[str]],
    novel_res: int = -1,
) -> dict[str, int]:
    """Ignore-novel mode (reference kg_eval_ignore_novel.py:93-160): the
    truth's novel suffix symbols are ignored for matching (stripped),
    the cohort is graded with the MatchType lattice, and genes whose
    truth carries novel symbols at ``novel_res`` are dropped from the
    summary afterwards.  ``novel_res=-1`` keeps every gene."""
    from .compare import calcSummaryByResolution, compareCohort

    def clean(a: str) -> str:
        return re.sub(r"[#=$+~]", "", a)

    cleaned = {
        sid: [clean(a) for a in alleles if not isFusionAllele(a)]
        for sid, alleles in truth.items()
    }
    results = compareCohort(cleaned, predictions, skip_empty=False)
    if novel_res < 0:
        return calcSummaryByResolution(
            r for rs in results.values() for r in rs
        )
    kept = []
    for sid, rs in results.items():
        excluded = excludedGenesForSample(truth.get(sid, []), novel_res)
        kept.extend(
            r
            for r in rs
            if getGeneName(r.answer_allele or r.predit_allele) not in excluded
        )
    return calcSummaryByResolution(kept)
