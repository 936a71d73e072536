"""
Possible-set statistics: how often does the truth appear among the
exported candidate allele sets, and at what rank / set count?

Equivalent of research/kg_eval_multi.py (131 LoC): the typing facade
exports every candidate set within 90% of the best likelihood
(`TypingWithPosNegAllele.getAllPossibleTyping`); this module summarises,
per gene and overall, (a) how many candidate sets were kept, (b) whether
the truth set is among them at a given digit resolution, and (c) the rank
of the first matching set (rank 0 = the called answer was right).
"""
from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass

import pandas as pd

from ..utils import getAlleleField, getGeneName


def _setKey(alleles: list[str], digits: int) -> tuple:
    """Order-free comparison key of an allele multiset at a resolution."""
    return tuple(sorted(getAlleleField(a, digits) for a in alleles if a))


@dataclass
class PossibleSetStat:
    sample_id: str
    gene: str
    n_sets: int
    truth_rank: int  # -1 = truth not in any exported set
    top_correct: bool


def evalPossibleSets(
    possible_rows: list[dict],
    truth_alleles: list[str],
    sample_id: str = "",
    digits: int = 7,
) -> list[PossibleSetStat]:
    """Score one sample's exported possible sets against its truth.

    ``possible_rows`` is the facade's export: dicts with keys
    ``gene``/``rank``/``value`` and ``"1"``, ``"2"``, ... allele columns.
    ``truth_alleles`` is the sample's full truth list (all genes mixed,
    with multiplicity — the generator's summary format).
    """
    by_gene: dict[str, list[dict]] = defaultdict(list)
    for row in possible_rows:
        by_gene[str(row["gene"])].append(row)

    truth_by_gene: dict[str, list[str]] = defaultdict(list)
    for a in truth_alleles:
        truth_by_gene[getGeneName(a)].append(a)

    stats = []
    for gene, rows in by_gene.items():
        rows = sorted(rows, key=lambda r: r["rank"])
        # facade gene keys are backbone names ("GENE*BACKBONE")
        truth = truth_by_gene.get(getGeneName(gene), [])
        truth_key = _setKey(truth, digits)
        truth_rank = -1
        for row in rows:
            alleles = [
                str(v)
                for k, v in row.items()
                if k not in ("gene", "rank", "value") and v
            ]
            if _setKey(alleles, digits) == truth_key:
                truth_rank = int(row["rank"])
                break
        stats.append(
            PossibleSetStat(
                sample_id=sample_id,
                gene=gene,
                n_sets=len(rows),
                truth_rank=truth_rank,
                top_correct=truth_rank == 0,
            )
        )
    return stats


def summarizePossibleSets(stats: list[PossibleSetStat]) -> pd.DataFrame:
    """Per-gene summary: set counts, hit rate anywhere, hit rate at top."""
    per_gene: dict[str, Counter] = defaultdict(Counter)
    for s in stats:
        c = per_gene[getGeneName(s.gene)]
        c["n"] += 1
        c["sets"] += s.n_sets
        c["in_any"] += s.truth_rank >= 0
        c["at_top"] += s.top_correct
    rows = []
    for gene in sorted(per_gene):
        c = per_gene[gene]
        rows.append(
            {
                "gene": gene,
                "samples": c["n"],
                "mean_sets": c["sets"] / c["n"],
                "truth_in_possible": c["in_any"] / c["n"],
                "truth_at_top": c["at_top"] / c["n"],
            }
        )
    return pd.DataFrame(rows)
