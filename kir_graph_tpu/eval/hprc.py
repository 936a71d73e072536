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


def evaluateHprc(
    truth: dict[str, list[str]],
    predictions: dict[str, list[str]],
    digits: tuple[int, ...] = (3, 5, 7),
) -> pd.DataFrame:
    """Per-gene, per-resolution precision/recall/F1 table."""
    rows = []
    genes = sorted(
        {getGeneName(a) for alleles in truth.values() for a in alleles}
    )
    for n in digits:
        total = DigitCounts()
        for gene in genes:
            counts = DigitCounts()
            for sid, gt_alleles in truth.items():
                if sid not in predictions:
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
    return pd.DataFrame(rows)
