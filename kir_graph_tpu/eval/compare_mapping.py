"""
Read-level mapping accuracy vs simulation truth
(reference research/kg_eval_mapping.py — ours compares against the
simulator's (allele, fragment-start) truth instead of a truth SAM).
"""
from __future__ import annotations

import numpy as np

from ..align.pipeline import AlignResult
from ..index.build import KirIndex
from ..msa.genemsa import Genemsa
from ..sim.reads import SimReads
from ..utils import getGeneName, logger


def alleleToBackboneCols(msa: Genemsa, allele: str) -> np.ndarray:
    """Map each ungapped-allele position -> backbone column index."""
    gapped = msa.get(allele)
    keep = np.frombuffer(gapped.encode(), np.uint8) != ord("-")
    return np.nonzero(keep)[0]


def mappingAccuracy(
    result: AlignResult,
    sim: SimReads,
    index: KirIndex,
    genes_msa: dict[str, Genemsa],
    pos_tolerance: int = 16,
) -> dict[str, float]:
    """Fraction of pairs placed on the right gene / near the right column."""
    n = len(sim.truth_allele)
    gene_ok = 0
    pos_ok = 0
    mapped = 0
    col_maps: dict[str, np.ndarray] = {}
    for i in range(n):
        if result.gene[i] < 0:
            continue
        mapped += 1
        allele = sim.truth_allele[i]
        gene = getGeneName(allele)
        true_gene_name = f"{gene}*BACKBONE"
        got_gene = index.gene_names[result.gene[i]]
        if got_gene != true_gene_name:
            continue
        gene_ok += 1
        if allele not in col_maps:
            col_maps[allele] = alleleToBackboneCols(genes_msa[gene], allele)
        cmap = col_maps[allele]
        # truth: fragment start in allele coords -> backbone column
        tpos = sim.truth_pos[i]
        if tpos >= len(cmap):
            continue
        true_col = cmap[tpos]
        cols_l = result.cols_l[i]
        cols_r = result.cols_r[i]
        starts = [c[c >= 0].min() for c in (cols_l, cols_r) if (c >= 0).any()]
        if starts and abs(min(starts) - true_col) <= pos_tolerance:
            pos_ok += 1
    stats = {
        "n_pairs": n,
        "mapped": mapped / max(n, 1),
        "gene_acc": gene_ok / max(mapped, 1),
        "pos_acc": pos_ok / max(gene_ok, 1),
    }
    logger.info(f"[Eval] mapping {stats}")
    return stats
