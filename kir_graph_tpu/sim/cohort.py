"""
Cohort synthesis: sample haplotype pairs -> per-sample allele sets -> FASTQs.

Equivalent of research/kg_create_data.py:13-174: two haplotypes are drawn
from a haplotype->gene-copy-count table (e.g. the PING paper's
KIR_gene_haplotypes.csv — pass its path; a small synthetic table is used
otherwise), random alleles fill each gene copy, and the paired-read
simulator produces the FASTQs plus a truth summary TSV.

Adversarial generators (reference kg_create_novel.py / kg_create_fake_intron
/ kg_create_exonseq_only): `mutate_novel` spikes private SNVs into chosen
alleles; `exon_only_capture` keeps only exon-derived fragments.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..index.build import KirIndex
from ..msa.genemsa import Genemsa
from ..utils import logger
from .reads import simulatePairedReads, writeFastq
from .synth_db import alleleUngappedSeq


def readHaplotypeTable(csv_path: str) -> pd.DataFrame:
    """hapID + per-gene copy counts (reference kg_create_data.py:13-23)."""
    df = pd.read_csv(csv_path, encoding="utf-8-sig")
    assert "hapID" in df.columns
    return df


def syntheticHaplotypeTable(gene_names: list[str], seed: int = 0) -> pd.DataFrame:
    """A small haplotype table over the synthetic DB's genes."""
    rng = np.random.Generator(np.random.Philox(seed))
    rows = []
    for h in range(6):
        row = {"hapID": f"h{h:02d}"}
        for g in gene_names:
            if "3DL3" in g or "3DL2" in g:
                row[g] = 1  # framework genes: one copy per haplotype
            else:
                row[g] = int(rng.integers(0, 3)) if h else 1
        rows.append(row)
    return pd.DataFrame(rows)


@dataclass
class SampleTruth:
    sample_id: str
    haplos: tuple[str, str]
    alleles: list[str]                  # with multiplicity
    r1: str = ""
    r2: str = ""


def sampleCohortAlleles(
    index: KirIndex,
    haplo_df: pd.DataFrame,
    n_samples: int,
    seed: int = 44,
) -> list[SampleTruth]:
    """Two random haplotypes per sample; random allele per gene copy."""
    rng = np.random.Generator(np.random.Philox(seed))
    gene_cols = [c for c in haplo_df.columns if c != "hapID"]
    truths = []
    for s in range(n_samples):
        h1, h2 = rng.integers(0, len(haplo_df), size=2)
        alleles: list[str] = []
        for col in gene_cols:
            backbone = f"{col}*BACKBONE"
            if backbone not in index.genes:
                continue
            g = index.genes[backbone]
            cn = int(haplo_df.iloc[h1][col]) + int(haplo_df.iloc[h2][col])
            for _ in range(cn):
                alleles.append(g.alleles[int(rng.integers(0, len(g.alleles)))])
        truths.append(
            SampleTruth(
                sample_id=f"{s:02d}",
                haplos=(str(haplo_df.iloc[h1]["hapID"]), str(haplo_df.iloc[h2]["hapID"])),
                alleles=sorted(alleles),
            )
        )
    return truths


def exonCaptureSeq(msa, allele: str) -> str:
    """Concatenated exon sequence of an allele (exon-capture simulation,
    reference kg_create_exonseq_only.py)."""
    parts = []
    for b in msa.list_blocks():
        if b.type == "exon":
            s, e = msa.get_block_interval(b.name)
            parts.append(msa.get(allele)[s:e])
    return "".join(parts).replace("-", "").replace("E", "")


def intronSwapSeq(msa, allele: str, donor: str) -> str:
    """Allele's exons + donor's introns/UTRs: an 'intron-recombined' allele
    (reference kg_create_fake_intron.py).  Stresses exon-first typing —
    exon evidence points at `allele`, intron evidence at `donor`."""
    parts = []
    for b in msa.list_blocks():
        s, e = msa.get_block_interval(b.name)
        src = allele if b.type == "exon" else donor
        parts.append(msa.get(src)[s:e])
    return "".join(parts).replace("-", "").replace("E", "")


def mutateNovel(
    seq: str, n_variants: int, rng: np.random.Generator
) -> tuple[str, list[str]]:
    """Spike private SNVs into an allele sequence (kg_create_novel)."""
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    poss = rng.choice(len(arr), size=n_variants, replace=False)
    tags = []
    for p in sorted(poss):
        old = chr(arr[p])
        new = rng.choice([c for c in "ACGT" if c != old])
        arr[p] = ord(new)
        tags.append(f"{p}{old}>{new}")
    return arr.tobytes().decode(), tags


def versionDriftDB(
    genes_msa: dict[str, Genemsa],
    n_remove_per_gene: int = 1,
    seed: int = 7,
    min_kept: int = 2,
) -> tuple[dict[str, Genemsa], list[str]]:
    """'Old database' for DB-version-drift experiments (reference
    kg_create_version_diff_allele.py): remove up to `n_remove_per_gene`
    random non-backbone alleles per gene.  Simulate the cohort from the
    FULL MSAs, build the index from the returned reduced MSAs, and the
    removed alleles become unknown-to-the-DB truth — the pipeline should
    call their nearest catalogued relative.

    Returns (reduced genes_msa, removed allele names)."""
    rng = np.random.Generator(np.random.Philox(seed))
    out: dict[str, Genemsa] = {}
    removed: list[str] = []
    for gene, msa in genes_msa.items():
        names = [n for n in msa.get_sequence_names() if "BACKBONE" not in n]
        n_rm = min(n_remove_per_gene, max(0, len(names) - min_kept))
        if n_rm <= 0:
            out[gene] = msa
            continue
        victims = [
            names[i]
            for i in rng.choice(len(names), size=n_rm, replace=False)
        ]
        reduced = msa.copy()
        reduced.remove_allele(victims)
        out[gene] = reduced
        removed.extend(victims)
    return out, removed


def generateCohortFastq(
    genes_msa: dict[str, Genemsa],
    index: KirIndex,
    truths: list[SampleTruth],
    out_prefix: str,
    depth: float = 30.0,
    seed: int = 44,
    error_rate: float = 0.002,
    novel_per_sample: int = 0,
    exon_capture: bool = False,
    profile: str = "uniform",
) -> pd.DataFrame:
    """Write per-sample FASTQs + `{out_prefix}_summary.csv` truth table."""
    rows = []
    for t in truths:
        seqs: dict[str, str] = {}
        copies: dict[str, int] = {}
        rng = np.random.Generator(np.random.Philox(seed + int(t.sample_id)))
        for allele in t.alleles:
            gene = allele.split("*")[0]
            if exon_capture:
                seqs[allele] = exonCaptureSeq(genes_msa[gene], allele)
            else:
                seqs[allele] = alleleUngappedSeq(genes_msa[gene], allele)
            copies[allele] = copies.get(allele, 0) + 1
        novel_truth = ""
        if novel_per_sample and seqs:
            victim = list(seqs)[int(rng.integers(0, len(seqs)))]
            mutated, tags = mutateNovel(seqs[victim], novel_per_sample, rng)
            seqs[victim] = mutated
            logger.info(f"[Sim] {t.sample_id}: novel SNVs on {victim}: {tags}")
            # truth record for discovery grading: positions index the
            # SIMULATED sequence — the ungapped allele normally, the
            # concatenated-exon sequence when exon_capture=True
            # (eval/novel_qa.py maps either to backbone columns via the
            # MSA; pass exon_capture through to gradeNovelDiscovery)
            novel_truth = ";".join(f"{victim}:{tag}" for tag in tags)
        sim = simulatePairedReads(
            seqs,
            depth=depth,
            seed=seed * 1000 + int(t.sample_id),
            error_rate=error_rate,
            allele_copies=copies,
            sample_name=t.sample_id,
            profile=profile,
        )
        t.r1 = f"{out_prefix}.{t.sample_id}.read.1.fq.gz"
        t.r2 = f"{out_prefix}.{t.sample_id}.read.2.fq.gz"
        writeFastq(t.r1, sim.names, sim.r1, sim.q1 or None)
        writeFastq(t.r2, sim.names, sim.r2, sim.q2 or None)
        rows.append(
            {
                "id": t.sample_id,
                "haplos": "_".join(t.haplos),
                "alleles": "_".join(t.alleles),
                "name": f"{out_prefix}.{t.sample_id}",
                "novel": novel_truth,
            }
        )
    df = pd.DataFrame(rows)
    df.to_csv(f"{out_prefix}_summary.csv", sep="\t", index=False)
    return df
