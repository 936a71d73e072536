"""
Reference-genome plumbing for the WGS extraction stage.

Mirrors the reference's download/index surface
(/root/reference/graphkir/wgs.py:33-55 downloadHg19/downloadHg38/bwaIndex
and main.py:72-90 buildGenomeIndex): resolve a local hs37d5 / GRCh38
FASTA inside an index folder, fetching it through the external-tool
engine when absent, and validate that a user-supplied genome actually
carries the contigs the KIR/diploid region slicing needs.

This build has no egress: the download path shells `wget` through
exec_tools (so an engine-equipped deployment works unchanged) and raises
a clear error here instead of silently producing nothing.  The indexing
half of the reference's flow (`bwa index`) has no equivalent step — our
extraction (wgs/extract.py buildWgsIndex) slices regions and builds the
k-mer index directly from the FASTA, no genome-wide BWT needed.
"""
from __future__ import annotations

import gzip
import os

from ..exec_tools import runTool, toolAvailable
from ..utils import logger
from . import extract as _extract
from .extract import _parseRegion

# reference wgs.py:33-49
GENOME_SOURCES = {
    "hg19": (
        "hs37d5.fa.gz",
        "https://ftp.ncbi.nlm.nih.gov/1000genomes/ftp/technical/reference/"
        "phase2_reference_assembly_sequence/hs37d5.fa.gz",
    ),
    "hg38": (
        "hs38noalt.fa.gz",
        "https://ftp.ncbi.nlm.nih.gov/genomes/all/GCA/000/001/405/"
        "GCA_000001405.15_GRCh38/seqs_for_alignment_pipelines.ucsc_ids/"
        "GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz",
    ),
}


def _download(index_folder: str, ref_genome: str) -> str:
    fname, url = GENOME_SOURCES[ref_genome]
    out = os.path.join(index_folder, fname)
    logger.info(f"[WGS] Download {out}")
    if not toolAvailable("wget"):
        raise FileNotFoundError(
            f"reference genome {out} not found and no way to fetch it "
            f"(this build is offline / wget unavailable) — download "
            f"{url} yourself and place it there, or pass --wgs-genome"
        )
    runTool("wget", ["wget", url, "-O", out])
    return out


def downloadHg19(index_folder: str) -> str:
    """Fetch hs37d5 (hg19) into index_folder (reference wgs.py:33-39)."""
    return _download(index_folder, "hg19")


def downloadHg38(index_folder: str) -> str:
    """Fetch GRCh38 no-alt (hg38) into index_folder (wgs.py:42-49)."""
    return _download(index_folder, "hg38")


def scanFastaContigs(fasta: str, max_records: int = 0) -> list[str]:
    """Stream a (possibly gzipped) FASTA and return its contig names.

    Header-only scan — sequence lines are skipped without assembling
    them, so a whole-genome file costs decompression but no memory."""
    names: list[str] = []
    opener = gzip.open if fasta.endswith(".gz") else open
    with opener(fasta, "rt") as f:
        for line in f:
            if line.startswith(">"):
                names.append(line[1:].split()[0])
                if max_records and len(names) >= max_records:
                    break
    return names


def validateGenome(
    fasta: str, ref_genome: str = "hg19", diploid_gene: str = ""
) -> list[str]:
    """Check a user-supplied genome carries the contigs the extraction
    stage will slice (KIR window + optional diploid gene).  Returns the
    missing contig names (empty = valid); raises if the file is absent
    or has no FASTA records at all."""
    if not os.path.exists(fasta):
        raise FileNotFoundError(f"reference genome {fasta} not found")
    contigs = set(scanFastaContigs(fasta))
    if not contigs:
        raise ValueError(f"{fasta}: no FASTA records")
    # late attribute lookups: tests monkeypatch extract.KIR_REGIONS
    need = [_parseRegion(r)[0] for r in _extract.KIR_REGIONS[ref_genome]]
    if diploid_gene:
        need.append(
            _parseRegion(
                _extract.REGIONS_OF_DIPLOID[ref_genome][diploid_gene]
            )[0]
        )
    missing = sorted(set(need) - contigs)
    if missing:
        logger.warning(
            f"[WGS] {fasta} is missing contigs {missing} for {ref_genome} "
            "region extraction"
        )
    return missing


def buildGenomeIndex(
    index_folder: str = "index",
    ref_genome: str = "hg19",
    diploid_gene: str = "",
) -> str:
    """Resolve the reference genome for WGS extraction (reference
    main.py:72-90 buildGenomeIndex): reuse `{index_folder}/hs37d5.fa.gz`
    (or the hg38 analog) when present, download it otherwise, and
    validate the contig surface.  No bwa index is built — the region
    slicer consumes the FASTA directly."""
    if ref_genome not in GENOME_SOURCES:
        raise ValueError(
            f"Unsupported reference genome: {ref_genome}. Use 'hg19' or 'hg38'."
        )
    os.makedirs(index_folder, exist_ok=True)
    fname, _ = GENOME_SOURCES[ref_genome]
    path = os.path.join(index_folder, fname)
    if not os.path.exists(path):
        # also accept an uncompressed copy the user unpacked themselves
        plain = path[: -len(".gz")]
        if os.path.exists(plain):
            path = plain
        else:
            path = _download(index_folder, ref_genome)
    missing = validateGenome(path, ref_genome, diploid_gene)
    if missing:
        raise ValueError(
            f"{path} lacks required contigs {missing} for {ref_genome}"
        )
    return path
