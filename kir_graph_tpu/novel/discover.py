"""
Novel-allele discovery (reference novel_discover.py).

1. Assign each read to its best called allele (argmax of typing probs)
2. Tally variant confusion (tp/tn/fp/fn/novel) per assigned allele
3. Keep candidate novel SNVs with count >= 3 whose ALT wins the pileup
4. Apply surviving SNVs to the allele sequence -> `ALLELE-{pos}{alt}`

Pileup semantics match the reference's qname-filtered BAM query
(novel_discover.py:237-264): the per-position base counts are restricted
to the pairs ASSIGNED to the candidate allele's read group, one base per
pair (the reference keys its pileup dict by query name, so when both
mates cover the position the later one wins — here mate 2).  Placement
arrays saved by the pipeline (`.placements.npz`) stand in for the BAM;
when they are absent we fall back to the whole-gene unique pileup, which
is only equivalent at CN=1.
"""
from __future__ import annotations

import os
import sys
from collections import Counter
from itertools import chain
from typing import Iterable, TextIO, TypedDict

import numpy as np
import pandas as pd

from ..index.variants import Variant
from ..msa.genemsa import Genemsa, writeFasta
from ..typing.allele_typing import AlleleTyping
from ..typing.facade import TypingWithPosNegAllele
from ..typing.pairread import PairRead
from ..utils import logger

GroupPairRead = dict[tuple[str, ...], list[PairRead]]


class NovelVariant(TypedDict):
    gene: str
    allele: str
    allele_count: int
    type: str
    variant: Variant
    pos: int
    count: int
    skip: bool
    skip_reason: str
    base_ref: str
    base_alt: str
    pileup: dict[str, int]


def groupReadByAllele(
    typ: AlleleTyping, predict_alleles: list[str], reads: list[PairRead]
) -> GroupPairRead:
    """Assign reads to the called allele(s) with max per-read probability."""
    allele_names = [a for a in predict_alleles if a in typ.allele_to_id]
    allele_ids = [typ.allele_to_id[a] for a in allele_names]
    if not allele_names:
        return {}
    sel = typ.probs[:, allele_ids]
    is_max = sel == sel.max(axis=1)[:, None]
    out: GroupPairRead = {}
    names_arr = np.array(allele_names)
    for read, mx in zip(reads, is_max):
        key = tuple(sorted(names_arr[mx]))
        out.setdefault(key, []).append(read)
    return out


def variantConfusionInRead(
    read: PairRead, allele: str, variants: dict[str, Variant]
) -> dict[str, list[str]]:
    """tp/fp from positives, tn/fn from negatives, nv -> novel."""
    confusion: dict[str, list[str]] = {"novel": [], "tp": [], "tn": [], "fp": [], "fn": []}
    for v in chain(read.lpv, read.rpv):
        if v.startswith("nv"):
            confusion["novel"].append(v)
        elif allele in variants[v].allele:
            confusion["tp"].append(v)
        else:
            confusion["fp"].append(v)
    for v in chain(read.lnv, read.rnv):
        if v.startswith("nv"):
            confusion["novel"].append(v)
        elif allele in variants[v].allele:
            confusion["fn"].append(v)
        else:
            confusion["tn"].append(v)
    return confusion


def statNovelConfusion(
    allele: str, reads: list[PairRead], variants: dict[str, Variant]
) -> dict[str, int]:
    count = {"total": 0, "novel": 0, "tp": 0, "tn": 0, "fp": 0, "fn": 0}
    for read in reads:
        for stat, vs in variantConfusionInRead(read, allele, variants).items():
            count[stat] += len(vs)
    count["total"] = count["tp"] + count["tn"] + count["fp"] + count["fn"]
    return count


def extractNovelVariant(
    allele: str, reads: list[PairRead], variants: dict[str, Variant]
) -> dict[str, dict[Variant, int]]:
    """Candidate novel variants: fp (extra), fn (missing), nv (uncatalogued)."""
    hits: dict[str, list[Variant]] = {"novel": [], "fp": [], "fn": []}
    for read in reads:
        for stat, vs in variantConfusionInRead(read, allele, variants).items():
            if stat in hits:
                hits[stat] += [variants[v] for v in vs]
    return {stat: dict(Counter(vs)) for stat, vs in hits.items()}


def updateBaseRefAlt(
    nv: NovelVariant, backbone_seq: str, allele_seq: str
) -> NovelVariant:
    v = nv["variant"]
    base_ref = allele_seq[v.pos]
    if nv["type"] in ("fp", "novel"):
        base_alt = v.val
    elif nv["type"] == "fn":
        base_alt = backbone_seq[v.pos]
    else:
        raise NotImplementedError(nv["type"])
    assert base_ref != base_alt
    nv["base_ref"] = base_ref
    nv["base_alt"] = base_alt if isinstance(base_alt, str) else ""
    return nv


def applyNovelVariant(
    allele_seq: str, novel_variants: list[NovelVariant], out: TextIO
) -> str:
    for nv in novel_variants:
        if nv["skip"]:
            continue
        v = nv["variant"]
        if v.typ != "single":
            nv["skip"] = True
            nv["skip_reason"] = "Not implement indel"
            continue
        print(f"  Apply {v.ref}:{v.pos} {nv['base_ref']}>{nv['base_alt']}", file=out)
        allele_seq = allele_seq[: v.pos] + nv["base_alt"] + allele_seq[v.pos + 1 :]
    return allele_seq


class GroupPileup:
    """Read-group-restricted pileup over saved per-pair placements.

    Mirrors reference queryPileup + countFilterPileup
    (novel_discover.py:237-264): count one base per assigned pair at the
    queried backbone position; when both mates cover it, mate 2 wins
    (the reference's per-qname dict keeps the last mate seen).
    """

    def __init__(self, placements) -> None:
        if isinstance(placements, (str, bytes)):
            placements = np.load(placements)
        self.slot_of_pair = {
            int(r): i for i, r in enumerate(placements["pair_rows"])
        }
        self.cols_l = placements["cols_l"]
        self.cols_r = placements["cols_r"]
        self.bases_l = placements["bases_l"]
        self.bases_r = placements["bases_r"]

    def counts(self, reads: list[PairRead], pos: int) -> dict[str, int]:
        slots = np.array(
            [self.slot_of_pair[r.pair_index] for r in reads
             if r.pair_index in self.slot_of_pair],
            dtype=np.int64,
        )
        if not len(slots):
            return {}
        hit_l = self.cols_l[slots] == pos
        hit_r = self.cols_r[slots] == pos
        bl = np.where(hit_l.any(axis=1),
                      self.bases_l[slots, hit_l.argmax(axis=1)], -1)
        br = np.where(hit_r.any(axis=1),
                      self.bases_r[slots, hit_r.argmax(axis=1)], -1)
        base = np.where(br >= 0, br, bl)  # mate 2 wins
        base = base[base >= 0]
        out: dict[str, int] = {}
        for b, c in zip(*np.unique(base, return_counts=True)):
            out["ACGTN"[min(int(b), 4)]] = int(c)
        return out


def splitReadsByAlleles(
    model: TypingWithPosNegAllele, predict_alleles: list[str]
) -> Iterable[tuple[str, tuple[str, ...], list[PairRead], dict[str, Variant]]]:
    # PairRead ingestion route: _src.per_gene holds the read lists
    assert not model._src.from_evidence
    for gene, reads in model._src.per_gene.items():
        typ = AlleleTyping(
            reads, model._src.variants[gene], no_empty=False,
            variant_correction=False,
        )
        assign = groupReadByAllele(typ, predict_alleles, reads)
        for alleles, sel_reads in assign.items():
            yield gene, alleles, sel_reads, typ.variants


def discoverNovel(
    variant_name: str,
    msa_name: str,
    result_name: str,
    output_name: str,
    novel_descr: TextIO = sys.stdout,
    apply: bool = True,
    pileup: np.ndarray | None = None,
    gene_names: list[str] | None = None,
    placements=None,
) -> None:
    """Find and apply novel SNVs vs the called alleles.

    placements: per-pair placement arrays (path to `.placements.npz` or a
    loaded mapping) — enables the read-group-restricted pileup that
    matches the reference at CN>1.  Defaults to
    `{variant_name}.placements.npz` when that file exists.  Without it,
    pileup [G, Lmax, 5] + gene_names give the whole-gene unique pileup
    (CN=1-equivalent fallback only).
    """
    result = pd.read_csv(result_name + ".tsv", sep="\t")
    predict_alleles = result["alleles"][0].split("_")
    data = TypingWithPosNegAllele(variant_name + ".json")

    group_pileup: GroupPileup | None = None
    if placements is None and os.path.exists(variant_name + ".placements.npz"):
        placements = variant_name + ".placements.npz"
    if placements is not None:
        group_pileup = GroupPileup(placements)
    else:
        logger.warning(
            "[Novel] no placements available; falling back to the "
            "whole-gene pileup (read-group-exact only at CN=1)"
        )
        if pileup is None:
            pileup = np.load(variant_name + ".pileup.npy")
        if gene_names is None:
            # pileup rows follow index.gene_names (ALL genes, sorted) —
            # a reads-derived list would drop CN=0 genes and shift every
            # row after the gap; reconstruct the full list from the
            # per-gene MSA files instead
            import glob as _glob

            gene_names = sorted(
                os.path.basename(p)[len(os.path.basename(msa_name)) + 1:-5]
                + "*BACKBONE"
                for p in _glob.glob(msa_name + ".*.json")
            )
            if len(gene_names) != pileup.shape[0]:
                logger.warning(
                    "[Novel] MSA gene list does not match pileup rows "
                    f"({len(gene_names)} vs {pileup.shape[0]}); falling "
                    "back to reads-derived names"
                )
                gene_names = sorted(data._src.per_gene.keys())

    msas: dict[str, Genemsa] = {}
    allele_reads: GroupPairRead = {}
    allele_novel_variants: list[NovelVariant] = []
    allele_called_seqs: list[tuple[str, str, str]] = []
    allele_count: dict[str, int] = {}

    for gene, alleles, reads, variants in splitReadsByAlleles(data, predict_alleles):
        allele_reads[alleles] = reads
        if len(alleles) > 1:
            continue
        allele = alleles[0]
        allele_count[gene] = allele_count.get(gene, 0) + 1
        print(f"{gene} - {allele}", file=novel_descr)

        if gene not in msas:
            base = msa_name + "." + gene.split("*")[0]
            msas[gene] = Genemsa.load_msa(base + ".fa", base + ".json")
        msa = msas[gene]
        allele_seq = msa.get(allele).replace("E", "-")
        backbone_seq = msa.get_reference()[1]

        confusion = statNovelConfusion(allele, reads, variants)
        print(f"  Total reads: {len(reads)}", file=novel_descr)
        for stat, c in confusion.items():
            print(f"    {stat}: {c}", file=novel_descr)

        novel_variants: list[NovelVariant] = []
        for stat, vc in extractNovelVariant(allele, reads, variants).items():
            for variant, c in vc.items():
                novel_variants.append(
                    {
                        "gene": gene,
                        "allele": allele,
                        "allele_count": allele_count[gene],
                        "type": stat,
                        "variant": variant,
                        "pos": int(variant.pos),
                        "count": c,
                        "skip": False,
                        "skip_reason": "",
                        "base_ref": "",
                        "base_alt": "",
                        "pileup": {},
                    }
                )

        for nv in novel_variants:
            if nv["count"] < 3:
                nv["skip"] = True
                nv["skip_reason"] = "Number of variant too low"

        gi = gene_names.index(gene) if gene_names and gene in gene_names else -1
        for nv in novel_variants:
            if nv["skip"]:
                continue
            if group_pileup is not None:
                nv["pileup"] = group_pileup.counts(reads, nv["pos"])
            elif gi >= 0 and nv["pos"] < pileup.shape[1]:
                counts = pileup[gi, nv["pos"]]
                nv["pileup"] = {
                    "ACGTN"[b]: int(counts[b]) for b in range(5) if counts[b]
                }
            if not nv["pileup"]:
                nv["skip"] = True
                nv["skip_reason"] = "Pileup empty"

        for nv in novel_variants:
            if nv["skip"]:
                continue
            updateBaseRefAlt(nv, backbone_seq, allele_seq)
            if nv["pileup"].get(nv["base_alt"], 0) < max(nv["pileup"].values()):
                nv["skip"] = True
                nv["skip_reason"] = "ALT depths < REF depths"

        for nv in novel_variants:
            if not nv["skip"]:
                v = nv["variant"]
                print(
                    f"    {nv['type']:5s} {v.ref}:{v.pos} {v.val} ({v.typ}) "
                    f"id={v.id} num={nv['count']} pileup={nv['pileup']}",
                    file=novel_descr,
                )
        allele_novel_variants.extend(novel_variants)

        if apply:
            new_seq = applyNovelVariant(allele_seq, novel_variants, novel_descr)
            applied = [nv for nv in novel_variants if not nv["skip"]]
            allele_name = allele + "".join(
                f"-{nv['pos']}{nv['base_alt']}" for nv in applied
            )
            descr = ",".join(
                f"{allele}:{nv['pos']}{nv['base_ref']}>{nv['base_alt']}"
                for nv in applied
            )
            allele_called_seqs.append((allele_name, new_seq.replace("-", ""), descr))

    df = pd.DataFrame(allele_novel_variants)
    if len(df):
        df["variant_type"] = [v.typ for v in df["variant"]]
        df["variant_id"] = [v.id for v in df["variant"]]
        df["variant_val"] = [v.val for v in df["variant"]]
        df = df.drop("variant", axis=1)
    df.to_csv(output_name + ".variant.tsv", index=False, sep="\t")

    if apply:
        pd.DataFrame(
            [{"name": output_name,
              "alleles": "_".join(n for n, _, _ in allele_called_seqs)}]
        ).to_csv(output_name + ".tsv", sep="\t", index=False)
        writeFasta(output_name + ".fa", [(n, s) for n, s, _ in allele_called_seqs])
        # read-group assignment (BAM-free equivalent of groupReadToBam)
        groups = {
            ",".join(k): len(v) for k, v in allele_reads.items()
        }
        pd.DataFrame(
            [{"group": g, "reads": n} for g, n in groups.items()]
        ).to_csv(output_name + ".groups.tsv", sep="\t", index=False)
    logger.info(f"[Novel] wrote {output_name}.variant.tsv")
