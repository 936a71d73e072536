"""
Copy-number evaluation with merged-gene reconciliation
(reference research/kg_eval_cn.py:29-120).
"""
from __future__ import annotations

import copy
from collections import Counter
from typing import TypedDict

import pandas as pd

from ..utils import getGeneName, logger

GeneCN = dict[str, int]
CohortGeneCN = dict[str, GeneCN]


class CNDiff(TypedDict, total=False):
    gene: str
    total: int
    diff: int
    diff_abs: int
    sample_id: str


def readCNFile(tsv_file: str) -> GeneCN:
    df = pd.read_csv(tsv_file, sep="\t")
    return dict(zip(map(getGeneName, df["gene"]), df["cn"]))


def allele2CN(alleles: list[str]) -> GeneCN:
    return dict(Counter(map(getGeneName, alleles)))


def mergeGene(gene_cn: GeneCN, gene_to: str, gene_froms: list[str]) -> GeneCN:
    """Fold component genes into the merged gene's CN."""
    cn = 0
    for gene in gene_froms:
        if gene in gene_cn:
            cn += gene_cn.pop(gene)
    gene_cn[gene_to] = cn
    return gene_cn


_MERGED = [
    ("KIR2DL1S1", ["KIR2DL1", "KIR2DS1"]),
    ("KIR2DL5", ["KIR2DL5A", "KIR2DL5B"]),
    ("KIR2DL5AB", ["KIR2DL5A", "KIR2DL5B"]),
    ("KIR2DS35", ["KIR2DS3", "KIR2DS5"]),
    ("KIR2DL5A;KIR2DL5B", ["KIR2DL5A", "KIR2DL5B"]),
    ("KIR2DS3;KIR2DS5", ["KIR2DS3", "KIR2DS5"]),
]


def compareCN(ans_cn: GeneCN, pred_cn: GeneCN) -> list[CNDiff]:
    """Per-gene CN differences after reconciling merged gene names."""
    ans_cn = copy.deepcopy(ans_cn)
    pred_cn = copy.deepcopy(pred_cn)
    for merged, parts in _MERGED:
        if merged in pred_cn:
            mergeGene(ans_cn, merged, parts)

    comps: list[CNDiff] = []
    for gene in ans_cn.keys() | pred_cn.keys():
        comp: CNDiff = {"gene": gene, "total": 0, "diff": 0, "diff_abs": 0}
        if gene in ans_cn:
            comp["total"] += int(ans_cn[gene])
        diff = int(ans_cn.get(gene, 0)) - int(pred_cn.get(gene, 0))
        comp["diff"] += diff
        comp["diff_abs"] += abs(diff)
        if comp["total"] + comp["diff_abs"]:
            comps.append(comp)
    return comps


def compareCNCohort(
    cohort_ans: CohortGeneCN, cohort_pred: CohortGeneCN
) -> pd.DataFrame:
    """Cohort CN accuracy table (per-gene totals + abs diff)."""
    rows: list[CNDiff] = []
    for sid, ans in cohort_ans.items():
        if sid not in cohort_pred:
            continue
        for comp in compareCN(ans, cohort_pred[sid]):
            comp["sample_id"] = sid
            rows.append(comp)
    df = pd.DataFrame(rows)
    if len(df):
        summary = df.groupby("gene")[["total", "diff_abs"]].sum()
        acc = 1 - summary["diff_abs"].sum() / max(summary["total"].sum(), 1)
        logger.info(f"[Eval] CN accuracy {acc:.4f}")
    return df
