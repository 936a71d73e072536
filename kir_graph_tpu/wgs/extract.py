"""
WGS pre-filter: pull KIR-region reads out of whole-genome FASTQ and
measure diploid-gene coverage for CN normalisation.

The reference runs `bwa mem` against the whole hs37d5/GRCh38 genome and
slices the BAM by region (wgs.py:52-200).  The TPU-native equivalent keeps
only the *regions that matter* — the KIR window plus the chosen diploid
gene — as a linear reference, seeds reads against its k-mer table and
keeps pairs whose best placement passes the edit-distance filter.  Same
region coordinates as the reference (wgs.py:13-31, 140-147).

The genome itself must be provided locally (`genome_fasta`) — nothing is
downloaded in this build.
"""
from __future__ import annotations

import json

import numpy as np

from ..align.encode import encodeReads
from ..align.pipeline import GraphAligner
from ..index.build import KirIndex, buildIndexFromMsa
from ..msa.genemsa import Block, Genemsa, readFasta
from ..utils import logger

# reference wgs.py:13-31
REGIONS_OF_DIPLOID = {
    "hg19": {
        "VDR": "12:48235320-48298777",
        "RYR1": "19:38924331-39078204",
        "EGFR": "7:55086710-55279321",
    },
    "hg38": {
        "VDR": "chr12:47841537-47904994",
        "RYR1": "chr19:38433691-38587564",
        "EGFR": "chr7:55019017-55211628",
    },
}

# reference wgs.py:140-147 (hg19 also includes unplaced contig GL000209.1)
KIR_REGIONS = {
    "hg19": ["19:55200000-55400000", "GL000209.1"],
    "hg38": ["chr19:54720000-54870000"],
}


def _parseRegion(region: str) -> tuple[str, int | None, int | None]:
    if ":" not in region:
        return region, None, None
    chrom, span = region.split(":")
    start, end = span.split("-")
    return chrom, int(start), int(end)


class WgsIndex:
    """Linear (variant-free) region index driven by the same aligner."""

    def __init__(self, index: KirIndex, region_names: list[str]):
        self.index = index
        self.region_names = region_names
        self.aligner = GraphAligner(index)

    def kirRegionIds(self) -> set[int]:
        return {
            i
            for i, n in enumerate(self.index.gene_names)
            if n.startswith("KIR_region")
        }

    def diploidRegionIds(self) -> set[int]:
        return {
            i
            for i, n in enumerate(self.index.gene_names)
            if n.startswith("DIPLOID")
        }


def buildWgsIndex(
    genome_fasta: str,
    ref_type: str = "hg19",
    diploid_gene: str = "",
    kmer: int = 24,
) -> WgsIndex:
    """Slice the KIR (+ diploid) regions out of a local genome FASTA and
    build a linear alignment index over them."""
    contigs = dict(readFasta(genome_fasta))
    msas: dict[str, Genemsa] = {}

    def addRegion(tag: str, region: str) -> None:
        chrom, start, end = _parseRegion(region)
        if chrom not in contigs:
            logger.warning(f"[WGS] contig {chrom} missing in {genome_fasta}")
            return
        seq = contigs[chrom]
        seq = seq[(start or 1) - 1 : end or len(seq)].upper()
        name = tag
        msa = Genemsa(
            gene_name=name, blocks=[Block("gene", "gene_fragment", len(seq))]
        )
        msa.append(f"{name}*BACKBONE", seq)
        msa.set_reference(f"{name}*BACKBONE")
        msas[name] = msa

    for i, region in enumerate(KIR_REGIONS[ref_type]):
        addRegion(f"KIR_region{i}", region)
    if diploid_gene:
        addRegion("DIPLOID", REGIONS_OF_DIPLOID[ref_type][diploid_gene])
    index = buildIndexFromMsa(msas, kmer=kmer)
    return WgsIndex(index, sorted(msas))


def extractKirReads(
    wgs: WgsIndex,
    fq1: str,
    fq2: str,
    output_name: str,
    chunk: int = 65536,
    diploid_out: str = "",
) -> tuple[str, str, str]:
    """Stream FASTQ pairs; keep pairs placing in the KIR window.

    Returns (r1_out, r2_out, diploid_stat_json_or_"").
    Depth over the diploid region accumulates alongside (mean/std JSON like
    reference wgs.py:82-132).
    """
    import gzip

    kir_ids = wgs.kirRegionIds()
    dip_ids = wgs.diploidRegionIds()
    G, Lmax = wgs.index.backbone.shape
    dip_depth = np.zeros(Lmax, dtype=np.int64)

    # genuinely streamed I/O: a 30x WGS pair decompresses to hundreds of
    # GB — read chunk-wise and append kept pairs to the output writers
    # incrementally instead of materialising either side in RAM
    def opener(p, mode):
        return gzip.open(p, mode) if p.endswith(".gz") else open(p, mode)

    def readChunk(f, n):
        names, seqs = [], []
        for _ in range(n):
            h = f.readline()
            if not h:
                break
            seqs.append(f.readline().strip())
            f.readline()
            f.readline()
            names.append(h.strip()[1:].split()[0])
        return names, seqs

    r1_out = f"{output_name}.read.1.fq.gz"
    r2_out = f"{output_name}.read.2.fq.gz"
    n_total = 0
    n_kept = 0
    with opener(fq1, "rt") as f1, opener(fq2, "rt") as f2, \
            opener(r1_out, "wt") as w1, opener(r2_out, "wt") as w2:
        while True:
            n1, s1 = readChunk(f1, chunk)
            n2, s2 = readChunk(f2, chunk)
            assert len(n1) == len(n2), "unpaired FASTQ inputs"
            if not n1:
                break
            n_total += len(n1)
            c1, l1 = encodeReads(s1)
            c2, l2 = encodeReads(s2)
            res = wgs.aligner.alignPairs(c1, l1, c2, l2)
            for i in np.nonzero(res.gene >= 0)[0]:
                g = int(res.gene[i])
                if g in kir_ids:
                    n_kept += 1
                    w1.write(f"@{n1[i]}\n{s1[i]}\n+\n{'I' * len(s1[i])}\n")
                    w2.write(f"@{n2[i]}\n{s2[i]}\n+\n{'I' * len(s2[i])}\n")
                elif g in dip_ids:
                    for cols in (res.cols_l[i], res.cols_r[i]):
                        cc = cols[cols >= 0]
                        dip_depth[cc] += 1

    logger.info(f"[WGS] kept {n_kept}/{n_total} pairs in KIR region")

    stat_name = ""
    if dip_ids and diploid_out:
        covered = dip_depth[dip_depth > 0]
        mean = float(covered.mean()) if len(covered) else 0.0
        std = float(covered.std(ddof=1)) if len(covered) > 1 else 0.0
        stat_name = diploid_out
        with open(stat_name + ".json", "w") as f:
            json.dump({"mean": mean, "std": std, "name": output_name}, f)
        logger.info(f"[WGS] diploid depth mean={mean:.1f} std={std:.1f}")
    return r1_out, r2_out, stat_name
