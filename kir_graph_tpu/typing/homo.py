"""
Homozygosity / heterozygosity heuristics
(reference typing_mulit_allele.py:800-857).
"""
from __future__ import annotations

from ..index.variants import Variant
from .pairread import PairRead


def isHetrozygous(gene: str) -> bool:
    """Merged genes are forced heterozygous by name
    (reference typing_mulit_allele.py:800-804)."""
    return "2DL1S1" in gene or "2DL5" in gene


def isHomozygous(
    reads: list[PairRead], variants_map: dict[str, Variant], cn: int
) -> bool:
    """No convincingly bi-allelic position => homozygous.

    A position is heterozygous evidence when, after dropping counts <= 3
    and requiring total coverage >= 20, the runner-up base fraction
    exceeds 1/(2*cn).
    """
    if cn <= 1:
        return False

    v_record: dict[int, dict[str, int]] = {}
    for read in reads:
        for vid in read.lpv + read.rpv:
            v = variants_map[vid]
            if v.typ != "deletion":
                v_record.setdefault(v.pos, {})
                key = str(v.val)
                v_record[v.pos][key] = v_record[v.pos].get(key, 0) + 1
        for vid in read.lnv + read.rnv:
            v = variants_map[vid]
            if v.typ != "deletion":
                v_record.setdefault(v.pos, {})
                key = f"*{v.val}"
                v_record[v.pos][key] = v_record[v.pos].get(key, 0) + 1

    return homoHits(v_record, cn) == 0


def isHomozygousFromCounts(
    pos_inst, neg_inst, variants: list[Variant], cn: int
) -> bool:
    """`isHomozygous` from per-variant instance counts (the array path:
    identical v_record, aggregated instead of accumulated per read)."""
    if cn <= 1:
        return False
    v_record: dict[int, dict[str, int]] = {}
    for i, v in enumerate(variants):
        if v.typ == "deletion":
            continue
        if pos_inst[i]:
            v_record.setdefault(v.pos, {})[str(v.val)] = int(pos_inst[i])
        if neg_inst[i]:
            v_record.setdefault(v.pos, {})[f"*{v.val}"] = int(neg_inst[i])
    return homoHits(v_record, cn) == 0


def homoHits(v_record: dict[int, dict[str, int]], cn: int) -> int:
    hits = 0
    for val in v_record.values():
        if len(val) <= 1:
            continue
        if all(k.startswith("*") for k in val):
            continue  # all-negative positions carry no positive evidence
        counts = sorted(val.values(), reverse=True)
        counts = [c for c in counts if c > 3]
        total = sum(counts)
        if total < 20:
            continue
        strong = [c / total for c in counts if c / total > 0.1]
        if len(strong) == 1:
            continue
        if strong[1] > 1 / (cn * 2):
            hits += 1
    return hits
