"""
IPD-KIR database reader (offline).

The reference pulls IPD-KIR through pyhlamsa's KIRmsa, which downloads a
github branch (kir_msa.py:66-80).  This environment has no egress, so this
reader consumes a *local checkout* of the ANHIG/IPDKIR repository:

  {db_path}/msf/KIR2DL1_gen.msf   (full-length genomic alignments)
  {db_path}/msf/KIR2DL1_nuc.msf   (exon-only alignments)

MSF (GCG) is a block-interleaved alignment format; gaps are '.' in msf and
become '-' here, unknown positions in nuc alignments become 'E'.  Block
(exon/intron) boundaries come from the companion `gff/` or, when absent,
a single gene_fragment block is used (merge modes then re-label).
"""
from __future__ import annotations

import os
import re
from glob import glob

from ..utils import logger
from .genemsa import Block, Genemsa, blockTypeFromName

KIR_GENES = [
    "KIR2DL1", "KIR2DL2", "KIR2DL3", "KIR2DL4", "KIR2DL5",
    "KIR2DP1", "KIR2DS1", "KIR2DS2", "KIR2DS3", "KIR2DS4", "KIR2DS5",
    "KIR3DL1", "KIR3DL2", "KIR3DL3", "KIR3DP1", "KIR3DS1",
]


def parseMsf(filename: str) -> dict[str, str]:
    """GCG MSF -> {name: aligned sequence} ('.' and '~' -> '-')."""
    seqs: dict[str, list[str]] = {}
    in_body = False
    with open(filename) as f:
        for line in f:
            if not in_body:
                if line.strip().startswith("//"):
                    in_body = True
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            name = parts[0]
            # numeric ruler lines have no sequence letters
            chunk = "".join(parts[1:])
            if re.fullmatch(r"[0-9\s]+", chunk):
                continue
            seqs.setdefault(name, []).append(chunk)
    out = {}
    for name, chunks in seqs.items():
        seq = "".join(chunks).replace(".", "-").replace("~", "-").upper()
        out[name] = seq
    lengths = {len(s) for s in out.values()}
    assert len(lengths) <= 1, f"ragged MSF {filename}: {lengths}"
    return out


def parseGff(filename: str, gene: str) -> list[Block]:
    """IPD gff3 -> ordered block table for the gene's alignment."""
    blocks = []
    with open(filename) as f:
        for line in f:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 9:
                continue
            typ = cols[2]
            start, end = int(cols[3]), int(cols[4])
            if typ in ("five_prime_UTR", "exon", "intron", "three_prime_UTR"):
                blocks.append((start, end, typ))
    blocks.sort()
    out = []
    exon_i = intron_i = 0
    for start, end, typ in blocks:
        if typ == "exon":
            exon_i += 1
            name = f"exon{exon_i}"
        elif typ == "intron":
            intron_i += 1
            name = f"intron{intron_i}"
        elif typ == "five_prime_UTR":
            name = "5UTR"
        else:
            name = "3UTR"
        out.append(Block(name, typ, end - start + 1))
    return out


def _genMsa(db_path: str, gene: str) -> Genemsa | None:
    msf = os.path.join(db_path, "msf", f"{gene}_gen.msf")
    if not os.path.exists(msf):
        return None
    seqs = parseMsf(msf)
    length = len(next(iter(seqs.values())))
    msa = Genemsa(
        gene_name=gene,
        blocks=[Block("gene", "gene_fragment", length)],
    )
    for name, seq in sorted(seqs.items()):
        full = name if name.startswith("KIR") else f"{gene}*{name.split('*')[-1]}"
        msa.append(full, seq)
    gff = os.path.join(db_path, "gff", f"{gene}.gff")
    if os.path.exists(gff):
        blocks = parseGff(gff, gene)
        if sum(b.length for b in blocks) == length:
            msa.blocks = blocks
    return msa


def _nucMsa(db_path: str, gene: str) -> Genemsa | None:
    msf = os.path.join(db_path, "msf", f"{gene}_nuc.msf")
    if not os.path.exists(msf):
        return None
    seqs = parseMsf(msf)
    length = len(next(iter(seqs.values())))
    msa = Genemsa(gene_name=gene, blocks=[Block("cds", "exon", length)])
    for name, seq in sorted(seqs.items()):
        full = name if name.startswith("KIR") else f"{gene}*{name.split('*')[-1]}"
        msa.append(full, seq)
    return msa


def _mergeGenNuc(gen: Genemsa, nuc: Genemsa) -> Genemsa:
    """Add nuc-only alleles into the gen MSA with `E` introns.

    The nuc alignment is exon-concatenated; map its columns onto the gen
    MSA's exon blocks (requires equal exon lengths — true for IPD pairs
    after trimming); alleles already present in gen are kept as-is.
    """
    exon_parts = [p for p in gen.split_block() if p.blocks[0].type == "exon"]
    exon_len = sum(p.get_length() for p in exon_parts)
    if exon_len != nuc.get_length():
        logger.warning(
            f"[MSA] {gen.gene_name}: gen exon length {exon_len} != "
            f"nuc length {nuc.get_length()}; skipping exon-only alleles"
        )
        return gen

    new_names = [n for n in nuc.alleles if n not in gen.alleles]
    for name in new_names:
        nseq = nuc.get(name)
        row = []
        pos = 0
        for b in gen.blocks:
            s, e = gen.get_block_interval(b.name)
            if b.type == "exon":
                row.append(nseq[pos : pos + b.length])
                pos += b.length
            else:
                row.append("E" * b.length)
        gen.append(name, "".join(row))
    return gen


def readIpdKirDB(
    db_path: str, full_length_only: bool = True, version: str = "2100"
) -> dict[str, Genemsa]:
    """Local IPD-KIR checkout -> {gene: MSA} (gen [+ nuc] alignments)."""
    if not db_path or not os.path.isdir(db_path):
        raise FileNotFoundError(
            f"IPD-KIR db_path {db_path!r} not found — this build is offline; "
            "clone ANHIG/IPDKIR locally and pass its path"
        )
    genes: dict[str, Genemsa] = {}
    for gene in KIR_GENES + ["KIR2DL5A", "KIR2DL5B"]:
        gen = _genMsa(db_path, gene)
        if gen is None:
            continue
        if not full_length_only:
            nuc = _nucMsa(db_path, gene)
            if nuc is not None:
                gen = _mergeGenNuc(gen, nuc)
        genes[gene] = gen
    if not genes:
        raise FileNotFoundError(f"no {os.path.join(db_path, 'msf')}/*_gen.msf found")
    logger.info(f"[MSA] IPD-KIR {version}: {sorted(genes)}")
    return genes
