"""
Allele-call evaluation: greedy digit-resolution matching of predicted vs
answer allele sets (reference research/kg_eval.py:26-330, 422-494).
"""
from __future__ import annotations

import re
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Iterable, Iterator

import pandas as pd

from ..utils import getAlleleField, getGeneName, limitAlleleField, logger

CohortAlleles = dict[str, list[str]]


class MatchType(Enum):
    MATCH7 = 0b11111
    MATCH5 = 0b11101
    MATCH3 = 0b11001
    MATCHGENE = 0b10001
    FN = 0b10000
    FP = 0b00001
    NONE = 0b00000


@dataclass
class MatchResult:
    answer_allele: str
    predit_allele: str
    answer_allele_full: str
    predit_allele_full: str
    match_type: MatchType = MatchType.NONE
    # base-level diff (addBaseMatchness; reference kg_eval.py:352-386)
    answer_allele_length: int = 0
    predit_allele_length: int = 0
    base_diff: int = -1

    def __lt__(self, other: "MatchResult") -> bool:
        return (self.answer_allele or self.predit_allele) < (
            other.answer_allele or other.predit_allele
        )


CohortMatchResult = dict[str, list[MatchResult]]


def groupByGene(alleles: list[str]) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for name in alleles:
        out.setdefault(getGeneName(name), []).append(name)
    return out


def readAnswerAllele(summary_tsv: str) -> CohortAlleles:
    data = pd.read_csv(summary_tsv, sep="\t", dtype=str)
    return {r.id: sorted(r.alleles.split("_")) for r in data.itertuples()}


def saveCohortAllele(data: CohortAlleles, summary_tsv: str) -> None:
    pd.DataFrame(
        [
            {"id": sid, "alleles": "_".join(alleles), "name": f".{sid}."}
            for sid, alleles in data.items()
        ]
    ).to_csv(summary_tsv, index=False, sep="\t")


def extractID(name: str) -> str:
    """'cohort.00.xxx' -> '00'"""
    return re.findall(r"\.(\d{2,})\.", name)[0]


def readPredictResult(
    tsv_file: str, extract_func: Callable[[str], str] = extractID
) -> CohortAlleles:
    df = pd.read_csv(tsv_file, sep="\t", dtype=str)
    data = {}
    for r in df.itertuples():
        alleles = r.alleles.split("_") if isinstance(r.alleles, str) else []
        data[extract_func(str(r.name))] = sorted(alleles)
    return data


def compareGene(a_list: list[str], b_list: list[str]) -> Iterator[MatchResult]:
    """Greedy 7 -> 5 -> 3 -> gene matching; leftovers are FN/FP
    (reference kg_eval.py:254-327)."""
    a_list, b_list = list(a_list), list(b_list)
    for digits, mtype in ((7, MatchType.MATCH7), (5, MatchType.MATCH5), (3, MatchType.MATCH3)):
        for allele_b in list(b_list):
            for allele_a in a_list:
                if getAlleleField(allele_a, digits) == getAlleleField(allele_b, digits):
                    a_list.remove(allele_a)
                    b_list.remove(allele_b)
                    yield MatchResult(
                        limitAlleleField(allele_a, 7),
                        limitAlleleField(allele_b, 7),
                        allele_a,
                        allele_b,
                        mtype,
                    )
                    break
    for allele_a, allele_b in zip(list(a_list), list(b_list)):
        a_list.remove(allele_a)
        b_list.remove(allele_b)
        yield MatchResult(
            limitAlleleField(allele_a, 7),
            limitAlleleField(allele_b, 7),
            allele_a,
            allele_b,
            MatchType.MATCHGENE,
        )
    for allele in a_list:
        yield MatchResult(limitAlleleField(allele, 7), "", allele, "", MatchType.FN)
    for allele in b_list:
        yield MatchResult("", limitAlleleField(allele, 7), "", allele, MatchType.FP)


def compareSample(answer_list: list[str], predict_list: list[str]) -> list[MatchResult]:
    """Compare one sample's allele sets (exon-only `e` suffix stripped,
    2DL5 unresolved handling as in kg_eval.py:231-252)."""
    predict_list = [a[:-1] if a.endswith("e") else a for a in predict_list]
    answer_dict = groupByGene(answer_list)
    predit_dict = groupByGene(predict_list)

    if "KIR2DL5*unresolved" in predict_list:
        answer_dict["KIR2DL5"] = answer_dict.pop("KIR2DL5A", []) + answer_dict.pop(
            "KIR2DL5B", []
        )

    results: list[MatchResult] = []
    for gene in answer_dict.keys() | predit_dict.keys():
        results.extend(
            compareGene(answer_dict.get(gene, []), predit_dict.get(gene, []))
        )
    return sorted(results)


def lcsLength(a: str, b: str) -> int:
    """Longest-common-subsequence length via the bit-parallel row DP
    (Crochemore/Iliopoulos/Pinzon).  Python bigints give free multi-word
    carries, so a 16 kb x 16 kb pair runs in ~0.1 s — replacing the
    reference's Bio.pairwise2.localxx score (kg_eval.py:361-364), whose
    no-penalty local score equals the LCS length."""
    n = len(a)
    if not n or not b:
        return 0
    pm: dict[str, int] = {}
    for i, c in enumerate(a):
        pm[c] = pm.get(c, 0) | (1 << i)
    mask = (1 << n) - 1
    v = mask
    for c in b:
        m = pm.get(c, 0)
        v = ((v + (v & m)) | (v & ~m)) & mask
    return n - v.bit_count()


def addBaseMatchness(
    results: CohortMatchResult, allele_seqs: dict[str, str]
) -> None:
    """Fill base-level diff (answer length - LCS score) for every matched
    pair whose sequences are known (reference addBaseMatchness,
    kg_eval.py:375-386)."""
    matched = (
        MatchType.MATCH7, MatchType.MATCH5, MatchType.MATCH3,
        MatchType.MATCHGENE,
    )
    for rs in results.values():
        for r in rs:
            if r.match_type not in matched:
                continue
            sa = allele_seqs.get(r.answer_allele_full, "")
            sp = allele_seqs.get(r.predit_allele_full, "")
            if not sa or not sp:
                continue
            score = lcsLength(sa, sp)
            r.answer_allele_length = len(sa)
            r.predit_allele_length = len(sp)
            r.base_diff = len(sa) - score


def compareCohort(
    cohort_answer: CohortAlleles,
    cohort_predit: CohortAlleles,
    skip_empty: bool = True,
    verbose_sample: bool = False,
) -> CohortMatchResult:
    """Per-sample comparison over the cohort + summary print."""
    results: CohortMatchResult = {}
    for sid, answer in cohort_answer.items():
        if sid not in cohort_predit:
            if not skip_empty:
                results[sid] = [
                    MatchResult(limitAlleleField(a, 7), "", a, "", MatchType.FN)
                    for a in answer
                ]
            continue
        results[sid] = compareSample(answer, cohort_predit[sid])
        if verbose_sample:
            for r in results[sid]:
                logger.info(
                    f"[Eval] {sid} {r.match_type.name:9s} "
                    f"{r.answer_allele:22s} {r.predit_allele}"
                )
    summary = calcSummaryByResolution(
        r for rs in results.values() for r in rs
    )
    logger.info(f"[Eval] {summary}")
    return results


def calcSummaryByResolution(results: Iterable[MatchResult]) -> dict[str, int]:
    """Counts at each resolution + FN/FP (kg_eval.py:422-470 semantics)."""
    summary = {
        "total": 0,
        "match7": 0,
        "match5": 0,
        "match3": 0,
        "match_gene": 0,
        "FN": 0,
        "FP": 0,
    }
    for r in results:
        if r.match_type == MatchType.FP:
            summary["FP"] += 1
            continue
        summary["total"] += 1
        if r.match_type == MatchType.FN:
            summary["FN"] += 1
            continue
        # match lattice accumulates downward: a 7-digit match is also 5/3/gene
        summary["match_gene"] += 1
        if r.match_type in (MatchType.MATCH7, MatchType.MATCH5, MatchType.MATCH3):
            summary["match3"] += 1
        if r.match_type in (MatchType.MATCH7, MatchType.MATCH5):
            summary["match5"] += 1
        if r.match_type == MatchType.MATCH7:
            summary["match7"] += 1
    return summary


def calcSummaryByGene(
    results: Iterable[MatchResult],
) -> dict[str, dict[str, int]]:
    """Per-gene resolution summary (reference kg_eval.py:167-229 groups
    the cohort comparison by gene for its per-gene accuracy plot)."""
    by_gene: dict[str, list[MatchResult]] = {}
    for r in results:
        gene = getGeneName(r.answer_allele or r.predit_allele)
        by_gene.setdefault(gene, []).append(r)
    return {
        gene: calcSummaryByResolution(rs)
        for gene, rs in sorted(by_gene.items())
    }


def saveCompareReport(results: CohortMatchResult, prefix: str) -> None:
    """Human-debugging surface for a cohort regression (reference
    kg_eval.py:167-229): per-call CSV, per-gene CSV, and a dependency-free
    per-gene accuracy chart.

    Writes `{prefix}.sample.csv`, `{prefix}.gene.csv`, `{prefix}.gene.html`.
    """
    rows = [
        {
            "id": sid,
            "match": r.match_type.name,
            "answer": r.answer_allele_full,
            "predict": r.predit_allele_full,
            "base_diff": r.base_diff,
        }
        for sid, rs in sorted(results.items())
        for r in sorted(rs)
    ]
    pd.DataFrame(rows).to_csv(f"{prefix}.sample.csv", index=False)

    by_gene = calcSummaryByGene(r for rs in results.values() for r in rs)
    gene_rows = []
    for gene, s in by_gene.items():
        n = s["total"]
        gene_rows.append(
            {
                "gene": gene,
                **s,
                "acc_gene": s["match_gene"] / n if n else 0.0,
                "acc_7digit": s["match7"] / n if n else 0.0,
            }
        )
    pd.DataFrame(gene_rows).to_csv(f"{prefix}.gene.csv", index=False)

    from ..plot import barFigure, savePlot

    genes = [g["gene"] for g in gene_rows]
    figs = [
        barFigure(
            "per-gene accuracy (gene-level)",
            genes, [g["acc_gene"] for g in gene_rows], y_range=(0.0, 1.0),
        ),
        barFigure(
            "per-gene accuracy (7-digit)",
            genes, [g["acc_7digit"] for g in gene_rows], y_range=(0.0, 1.0),
        ),
        barFigure(
            "per-gene call errors (FN + FP)",
            genes, [float(g["FN"] + g["FP"]) for g in gene_rows],
        ),
    ]
    savePlot(f"{prefix}.gene.html", figs)
