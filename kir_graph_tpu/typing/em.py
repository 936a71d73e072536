"""
HISAT2-genotype-style EM abundance typing (SQUAREM-accelerated).

Behavioural port of reference typing_em.py:68-215; the EM iteration is a
small dense fixpoint, expressed in numpy (cohort-scale batching happens one
gene at a time and the matrices are tiny relative to alignment).
"""
from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from itertools import chain

import numpy as np

from .pairread import PairRead, ReadsAndVariantsData


@dataclass
class Hisat2AlleleResult:
    allele: str
    count: int      # reads voting for the allele
    prob: float     # EM abundance
    cn: int = 0


def preprocessHisatReads(
    reads_data: ReadsAndVariantsData,
) -> dict[str, list[dict[str, list[list[str]]]]]:
    """Group unique-mapped reads by backbone; map variant ids -> allele lists
    (reference typing_em.py:37-65)."""
    v2a = {v.id: v.allele for v in reads_data["variants"]}
    out: dict[str, list[dict[str, list[list[str]]]]] = {}
    for read in reads_data["reads"]:
        assert read.multiple == 1
        out.setdefault(read.backbone, []).append(
            {
                "lp": [v2a[v] for v in read.lpv],
                "ln": [v2a[v] for v in read.lnv],
                "rp": [v2a[v] for v in read.rpv],
                "rn": [v2a[v] for v in read.rnv],
            }
        )
    return out


def getCandidateAllelePerRead(
    positive: list[list[str]], negative: list[list[str]]
) -> list[str]:
    """intersection of positives minus union of negatives
    (reference typing_em.py:68-87)."""
    candidate: set[str] | None = None
    for alleles in positive:
        candidate = set(alleles) if candidate is None else candidate & set(alleles)
    if candidate is None:
        return []
    for alleles in negative:
        candidate -= set(alleles)
    return list(candidate)


def getMostFreqAllele(candidates: list[str]) -> list[str]:
    count = Counter(candidates)
    if not count:
        return []
    m = max(count.values())
    return [a for a, c in count.items() if c == m]


def hisatEMnp(
    allele_per_read: list[list[str]],
    seq_len: dict[str, int] | None = None,
    iter_max: int = 300,
    diff_threshold: float = 0.0001,
) -> dict[str, float]:
    """Allele abundance via SQUAREM-accelerated EM
    (reference typing_em.py:107-188)."""
    allele_name = sorted(set(chain.from_iterable(allele_per_read)))
    if not allele_name:
        return {}
    a_idx = {a: i for i, a in enumerate(allele_name)}
    A = len(allele_name)
    lens = (
        np.array([seq_len[a] for a in allele_name], dtype=np.float64)
        if seq_len
        else np.ones(A)
    )
    select = np.zeros((len(allele_per_read), A))
    for r, alleles in enumerate(allele_per_read):
        for a in alleles:
            select[r, a_idx[a]] = 1

    def step(prob: np.ndarray) -> np.ndarray:
        w = prob * select
        denom = w.sum(axis=1, keepdims=True)
        w = np.divide(w, denom, out=np.zeros_like(w), where=denom != 0)
        w = (w / lens).sum(axis=0)
        return w / w.sum()

    prob = step(np.ones(A))
    for _ in range(iter_max):
        p1 = step(prob)
        p2 = step(p1)
        r = p1 - prob
        v = p2 - p1 - r
        v_sum = (v ** 2).sum()
        if v_sum > 0:
            g = -np.sqrt((r ** 2).sum() / v_sum)
            p3 = np.maximum(prob - 2 * g * r + g * g * v, 0)
            p1 = step(p3)
        if np.abs(prob - p1).sum() <= diff_threshold:
            prob = p1
            break
        prob = p1
    return dict(zip(allele_name, prob))


def hisat2TypingPerGene(
    reads_alleles: list[dict[str, list[list[str]]]]
) -> list[Hisat2AlleleResult]:
    """Original HISAT2-genotype per-gene call (reference typing_em.py:191-215)."""
    votes = []
    for read in reads_alleles:
        votes.append(
            getMostFreqAllele(
                getCandidateAllelePerRead(read["lp"], read["ln"])
                + getCandidateAllelePerRead(read["rp"], read["rn"])
            )
        )
    prob = hisatEMnp(votes)
    count = Counter(chain.from_iterable(votes))
    return [
        Hisat2AlleleResult(allele=a, count=count[a], prob=prob.get(a, 0.0))
        for a in prob.keys() | count.keys()
    ]


def printHisatTyping(hisat_result, first_n: int = 10, file=None) -> None:
    import sys

    file = file or sys.stdout
    for backbone, result in hisat_result.items():
        print(backbone, file=file)
        by_count = sorted(result, key=lambda i: i.count, reverse=True)
        for i, allele in enumerate(by_count[:first_n]):
            print(f"  {i + 1:2d} {allele.allele:18s} (count: {allele.count})", file=file)
        by_prob = sorted(result, key=lambda i: i.prob, reverse=True)
        for i, allele in enumerate(by_prob[:first_n]):
            print(
                f"  Rank {i + 1:2d} {allele.allele:18s} "
                f"(abundance: {allele.prob:.2f}, cn: {allele.cn})",
                file=file,
            )
