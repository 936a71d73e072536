"""
Intron imputation for exon-only alleles (reference msa_cds_intron.py).

Exon-only (nuc) alleles carry `E` in intron blocks; their introns are
filled from the consensus of the nearest-named full-length alleles
(7 -> 5 -> 3 digit backoff) and the filled allele gets an `e` suffix.
"""
from __future__ import annotations

from typing import Iterable

from ..utils import getAlleleField, limitAlleleField, logger
from .genemsa import Genemsa


def removeExonIncompleteSeq(msa: Genemsa) -> Genemsa:
    """Drop alleles with unknown (E) bases inside an exon block."""
    remove_names = set()
    for part in msa.split_block():
        if part.blocks[0].type == "exon":
            for name, seq in part.alleles.items():
                if "E" in seq:
                    remove_names.add(name)
    if remove_names:
        logger.info(f"[MSA] Remove alleles with incomplete exons: {sorted(remove_names)}")
    return msa.remove_allele(remove_names, inplace=False)


def searchNearestName(full_names: Iterable[str], target_name: str) -> list[str]:
    """Full-length alleles sharing the longest name prefix with the target,
    backing off 7 -> 5 -> 3 digits; empty when nothing matches at 3."""
    if not target_name[-1].isdigit():
        target_name = target_name[:-1]
    field = len(getAlleleField(target_name))
    assert field in [3, 5, 7], f"odd allele field width for {target_name}"
    full_names = list(full_names)
    while True:
        nearest = [n for n in full_names if n.startswith(target_name)]
        if nearest:
            return nearest
        if field == 3:
            return []
        field -= 2
        target_name = limitAlleleField(target_name, field)


def getNearestConsensus(msa: Genemsa, target_names: list[str]) -> str:
    if not target_names:
        return msa.select_complete().get_consensus(include_gap=True)
    return msa.select_allele(target_names).get_consensus(include_gap=True)


def fillByConsensus(seq: str, consensus: str) -> str:
    return "".join(c if c != "E" else k for c, k in zip(seq, consensus))


def fillByNearestName(msa: Genemsa) -> Genemsa:
    """Fill each exon-only allele's introns; suffix filled alleles with `e`."""
    new_msa = msa.copy(copy_allele=False)
    full_names = list(msa.select_complete().alleles.keys())
    exon_names = list(msa.select_incomplete().alleles.keys())

    for name in full_names:
        new_msa.append(name, msa.get(name))
    for name in exon_names:
        nearest = searchNearestName(full_names, name)
        logger.debug(f"[MSA] fill introns of {name} from {nearest or 'all'}")
        consensus = getNearestConsensus(msa, nearest)
        new_msa.append(name + "e", fillByConsensus(msa.get(name), consensus))
    return new_msa


def fillMissingIntrons(genes: dict[str, Genemsa]) -> dict[str, Genemsa]:
    out = {}
    for gene, msa in genes.items():
        msa = removeExonIncompleteSeq(msa)
        out[gene] = fillByNearestName(msa)
    return out
