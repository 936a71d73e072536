"""
Index QA: structural sanity of a built index against its source MSAs
(the checkable core of reference research/kg_eval_index.py — variant
catalogs, allele reconstruction, exon masks, dissimilarity stats —
without the plotly layer).

The killer check is `checkAlleleReconstruction`: applying an allele's
membership row (its SNP/deletion set) to the backbone must reproduce the
allele's gapped MSA sequence exactly — if the catalog, positions, or
membership matrix drift, typing evidence silently degrades.
"""
from __future__ import annotations

import numpy as np

from ..index.build import KirIndex
from ..msa.genemsa import Genemsa
from ..utils import logger


def checkVariantCatalog(index: KirIndex) -> list[str]:
    """Ordering, bounds and id-uniqueness of every gene's catalog."""
    problems: list[str] = []
    for name in index.gene_names:
        g = index.genes[name]
        keys = [
            (int(p), bool(d), int(v))
            for p, d, v in zip(g.var_pos, g.var_is_del, g.var_val)
        ]
        if len(set(keys)) != len(keys):
            problems.append(f"{name}: duplicate variant keys")
        elif sorted(keys) != keys:
            problems.append(f"{name}: variant keys out of order")
        if len(g.variants) != len(set(str(v.id) for v in g.variants)):
            problems.append(f"{name}: duplicate variant ids")
        if len(g.var_pos) and (
            g.var_pos.min() < 0 or g.var_pos.max() >= g.length
        ):
            problems.append(f"{name}: variant position out of backbone")
        dels = g.var_is_del
        if len(g.var_pos) and (
            (g.var_pos[dels] + g.var_val[dels]) > g.length
        ).any():
            problems.append(f"{name}: deletion runs past backbone end")
        if not g.membership.any(axis=1).all():
            problems.append(f"{name}: variant carried by no allele")
    return problems


def checkExonMasks(index: KirIndex, genes: dict[str, Genemsa]) -> list[str]:
    """var_in_exon flags must match the MSA block table exactly."""
    problems: list[str] = []
    for name in index.gene_names:
        g = index.genes[name]
        gene = name.split("*")[0]
        if gene not in genes:
            continue
        msa = genes[gene]
        mask = np.zeros(msa.get_length(), dtype=bool)
        pos = 0
        for b in msa.blocks:
            if b.type == "exon":
                mask[pos : pos + b.length] = True
            pos += b.length
        # variant coords are backbone (gap-free) coords: project the mask
        ref_name, ref_seq = msa.get_reference()
        gapped = np.frombuffer(msa.get(ref_name).encode(), np.uint8)
        keep = gapped != ord("-")
        bmask = mask[: len(keep)][keep]
        for vi, v in enumerate(g.variants):
            if not (0 <= g.var_pos[vi] < len(bmask)):
                problems.append(
                    f"{name}: variant {v.id} position outside backbone"
                )
                continue
            want = bool(bmask[g.var_pos[vi]])
            if bool(g.var_in_exon[vi]) != want:
                problems.append(
                    f"{name}: variant {v.id} at {int(g.var_pos[vi])} "
                    f"in_exon={bool(g.var_in_exon[vi])} != block table {want}"
                )
    return problems


def checkAlleleReconstruction(
    index: KirIndex, genes: dict[str, Genemsa], max_alleles: int | None = None
) -> list[str]:
    """backbone + membership row == allele sequence, for every allele."""
    problems: list[str] = []
    for name in index.gene_names:
        g = index.genes[name]
        gene = name.split("*")[0]
        if gene not in genes:
            continue
        msa = genes[gene]
        ref_name, _ = msa.get_reference()
        gapped_ref = np.frombuffer(msa.get(ref_name).encode(), np.uint8)
        keep = gapped_ref != ord("-")
        snp = ~g.var_is_del
        for ai, aname in enumerate(g.alleles[:max_alleles]):
            if aname not in msa.alleles:
                continue
            seq = np.frombuffer(msa.get(aname).encode(), np.uint8)[keep]
            if (seq == ord("E")).any():
                continue  # exon-only allele: introns are not reconstructible
            rec = g.seq.astype(np.int64)
            mine = g.membership[:, ai]
            bad_pos = mine & (
                (g.var_pos < 0) | (g.var_pos >= g.length)
            )
            if bad_pos.any():
                problems.append(
                    f"{name}/{aname}: carried variant outside backbone"
                )
                continue
            for vi in np.nonzero(mine & snp)[0]:
                rec[g.var_pos[vi]] = g.var_val[vi]
            for vi in np.nonzero(mine & g.var_is_del)[0]:
                rec[g.var_pos[vi] : g.var_pos[vi] + g.var_val[vi]] = -1
            want = np.frombuffer(b"ACGT", np.uint8)
            got = np.where(rec >= 0, want[np.clip(rec, 0, 3)], ord("-"))
            if not np.array_equal(got, seq):
                nbad = int((got != seq).sum())
                problems.append(
                    f"{name}/{aname}: reconstruction differs at {nbad} cols"
                )
    return problems


def runIndexQA(
    index: KirIndex,
    genes: dict[str, Genemsa],
    max_alleles: int | None = None,
) -> dict:
    """Full QA sweep -> report dict; raises nothing, logs a summary."""
    report = {
        "catalog": checkVariantCatalog(index),
        "exon_masks": checkExonMasks(index, genes),
        "reconstruction": checkAlleleReconstruction(index, genes, max_alleles),
        "n_genes": len(index.gene_names),
        "n_variants": int(sum(len(g.variants) for g in index.genes.values())),
        "n_alleles": int(sum(len(g.alleles) for g in index.genes.values())),
    }
    n_prob = sum(len(v) for v in report.values() if isinstance(v, list))
    report["ok"] = n_prob == 0
    logger.info(
        f"[IndexQA] {report['n_genes']} genes, {report['n_variants']} "
        f"variants, {report['n_alleles']} alleles: "
        + ("OK" if report["ok"] else f"{n_prob} problems")
    )
    return report
