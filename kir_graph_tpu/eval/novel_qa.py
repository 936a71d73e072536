"""
Grade novel-SNV DISCOVERY (not just allele typing) against spiked truth.

The research QA loop spikes private SNVs into one victim allele per
sample (sim/cohort.py `mutateNovel`, reference kg_create_novel.py) and
records them in the cohort truth table.  This module runs
`novel/discover.py` on each such sample and scores the applied variants
at (backbone column, alt base) resolution: precision / recall split by
the victim allele's copy number (CN=1 vs CN=2 read groups behave
differently — the reference's qname-restricted pileup is exactly what
makes CN=2 work).
"""
from __future__ import annotations

import glob
import io
import os

import numpy as np
import pandas as pd

from ..msa.genemsa import Genemsa
from ..utils import logger


# merged-backbone gene -> member genes (reference kir_msa.py merge modes)
_MERGED = {
    "KIR2DL1S1": ("KIR2DL1", "KIR2DS1"),
    "KIR2DL5": ("KIR2DL5A", "KIR2DL5B"),
}


def allelePosToColumn(
    msa: Genemsa, allele: str, pos: int, exon_only: bool = False
) -> int:
    """Ungapped allele-sequence position -> MSA/backbone column.

    ``exon_only=True`` interprets `pos` in exon-capture coordinates
    (the concatenated-exon sequence sim/cohort.exonCaptureSeq emits) —
    spiked-novel truth from an exon-capture cohort records positions in
    THAT space, not the full ungapped allele."""
    seq = msa.get(allele)
    arr = np.frombuffer(seq.encode(), dtype=np.uint8)
    keep = (arr != ord("-")) & (arr != ord("E"))
    if exon_only:
        exon_mask = np.zeros(len(arr), dtype=bool)
        for b in msa.list_blocks():
            if b.type == "exon":
                s, e = msa.get_block_interval(b.name)
                exon_mask[s:e] = True
        keep &= exon_mask
    cols = np.nonzero(keep)[0]
    return int(cols[pos])


def parseNovelTruth(novel: str) -> list[tuple[str, int, str, str]]:
    """'allele:123A>T;...' -> [(allele, pos, ref, alt)]"""
    out = []
    for item in str(novel).split(";"):
        if not item or item == "nan":
            continue
        allele, tag = item.rsplit(":", 1)
        pos, change = tag[:-3], tag[-3:]
        out.append((allele, int(pos), change[0], change[2]))
    return out


def gradeNovelDiscovery(
    truth_df: pd.DataFrame,
    msa_prefix: str,
    method: str = "full",
    exon_capture: bool = False,
) -> dict:
    """Run discovery per sample with spiked truth; return the P/R table.

    truth_df needs columns name/alleles/novel (sim/cohort.py summary).
    Discovery inputs are the per-sample pipeline artifacts next to
    `{name}.variant.*`; outputs land at `{name}.noveldisc.*`.
    """
    from ..novel.discover import discoverNovel

    msas: dict[str, Genemsa] = {}
    stats = {1: {"tp": 0, "fp": 0, "fn": 0}, 2: {"tp": 0, "fp": 0, "fn": 0}}
    n_graded = 0
    for _, row in truth_df.iterrows():
        truth = parseNovelTruth(row.get("novel", ""))
        if not truth:
            continue
        name = str(row["name"])
        variant_name = name + ".variant"
        hits = sorted(glob.glob(f"{variant_name}.cn_*.pv.{method}.tsv"))
        if not hits:
            logger.warning(f"[NovelQA] no typing result for {name}; skip")
            continue
        result_name = hits[0][:-4]
        out_name = name + ".noveldisc"
        discoverNovel(
            variant_name,
            msa_prefix,
            result_name,
            out_name,
            novel_descr=io.StringIO(),
        )
        dfv = pd.read_csv(out_name + ".variant.tsv", sep="\t")
        predicted: set[tuple[str, int, str]] = set()
        if len(dfv):
            applied = dfv[~dfv["skip"]]
            for _, r in applied.iterrows():
                predicted.add(
                    (str(r["gene"]), int(r["pos"]), str(r["base_alt"]))
                )

        alleles = str(row["alleles"]).split("_")

        def geneCN(gene: str) -> int:
            # members of a merged backbone pool their CN
            members = _MERGED.get(gene, (gene,))
            n = sum(a.split("*")[0] in members for a in alleles)
            return min(max(n, 1), 2)

        # split by each variant's OWN victim gene CN: at CN=2 the gene's
        # read group mixes two alleles and the assigned-read pileup is
        # what separates the novel from the sibling allele.  (A sample
        # may spike variants into genes of different CN — each variant
        # must land in its own bucket.)
        wanted_cn: dict[tuple[str, int, str], int] = {}
        for allele, pos, _ref, alt in truth:
            gene = allele.split("*")[0]
            if gene not in msas:
                base = f"{msa_prefix}.{gene}"
                msas[gene] = Genemsa.load_msa(base + ".fa", base + ".json")
            col = allelePosToColumn(
                msas[gene], allele, pos, exon_only=exon_capture
            )
            bb = msas[gene].get_reference()[0]
            wanted_cn[(bb, col, alt)] = geneCN(gene)
        for key, cn in wanted_cn.items():
            stats[cn]["tp" if key in predicted else "fn"] += 1
        for key in predicted - set(wanted_cn):
            # a spurious call buckets by the CN of the gene it was
            # called in (backbone name -> gene)
            stats[geneCN(key[0].split("*")[0])]["fp"] += 1
        n_graded += 1

    report: dict = {"samples_graded": n_graded}
    for cn, s in stats.items():
        p = s["tp"] / max(s["tp"] + s["fp"], 1)
        r = s["tp"] / max(s["tp"] + s["fn"], 1)
        report[f"cn{cn}"] = {**s, "precision": round(p, 4),
                             "recall": round(r, 4)}
    return report
