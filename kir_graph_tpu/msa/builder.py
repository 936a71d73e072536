"""
KIR MSA construction: DB -> per-gene MSAs with merge modes
(reference kir_msa.py).

Modes: split (17 genes) | ab (16, 2DL5A/B merged) | ab_2dl1s1 (15, +2DL1/S1
merged) | merge (single gene).  Gene merging splits each MSA into the 19
canonical blocks, realigns every block across genes (builtin center-star
by default; MUSCLE/ClustalO via exec_tools when installed), re-concatenates
and verifies losslessness.
"""
from __future__ import annotations

import os
from typing import Callable

from ..exec_tools import runTool, toolAvailable
from ..utils import logger
from .cds_intron import fillMissingIntrons
from .genemsa import (
    Genemsa,
    concatMsa,
    readFasta,
    readFromMSAs,
    saveAllMsa,
    writeFasta,
)
from .realign import centerStarAlign

KIR_BLOCK_NAMES = [
    "5UTR",
    "exon1", "intron1", "exon2", "intron2", "exon3", "intron3",
    "exon4", "intron4", "exon5", "intron5", "exon6", "intron6",
    "exon7", "intron7", "exon8", "intron8", "exon9",
    "3UTR",
]

BlockRecords = dict[str, list[tuple[str, str]]]


def removeBackbone(genes: dict[str, Genemsa]) -> dict[str, Genemsa]:
    for gene, msa in genes.items():
        backbone = f"{gene}*BACKBONE"
        if backbone in msa:
            msa.remove_allele([backbone])
    return genes


def splitMsaToBlocks(genes: dict[str, Genemsa]) -> BlockRecords:
    """Pool each block's ungapped sequences across genes
    (reference kir_msa.py:91-111; intron3/4 and intron5/6 fold down)."""
    blocks: BlockRecords = {}
    for msa in genes.values():
        for part in msa.split_block():
            name = part.blocks[0].name
            if name == "intron3/4":
                name = "intron3"
            elif name == "intron5/6":
                name = "intron5"
            blocks.setdefault(name, []).extend(part.to_records(gap=False))
    return blocks


def realignBlock(
    blocks: BlockRecords, method: str = "builtin", tmp_prefix: str = "tmp", threads: int = 1
) -> BlockRecords:
    """Realign each block's pooled sequences into a common MSA."""
    out: BlockRecords = {}
    for name, recs in blocks.items():
        recs = [(n, s) for n, s in recs if s]
        logger.debug(f"[MSA] realign block {name} ({len(recs)} seqs, {method})")
        if not recs:
            out[name] = []
        elif method == "builtin":
            out[name] = centerStarAlign(recs)
        elif method in ("muscle", "clustalo"):
            fa_in = f"{tmp_prefix}.{name}.fa"
            fa_out = f"{tmp_prefix}.{name}.{method}.fa"
            writeFasta(fa_in, recs)
            if method == "muscle":
                runTool("muscle", ["muscle", "-align", fa_in, "-threads",
                                   str(threads), "-output", fa_out])
            else:
                runTool("clustalo", ["clustalo", "--infile", fa_in, "-o", fa_out,
                                     "--outfmt", "fasta", "--threads",
                                     str(threads), "--force"])
            out[name] = readFasta(fa_out)
        else:
            raise NotImplementedError(method)
    return out


def mergeBlockToMsa(blocks: BlockRecords) -> Genemsa:
    """Concatenate aligned blocks (union of alleles) and relabel
    5UTR/exon/intron/3UTR (reference kir_msa.py:171-211)."""
    from .genemsa import blockTypeFromName

    parts = []
    for name in KIR_BLOCK_NAMES:
        if name not in blocks or not blocks[name]:
            continue
        part = Genemsa.from_sequences(blocks[name])
        part.blocks[0].name = name
        part.blocks[0].type = blockTypeFromName(name)
        parts.append(part)
    return concatMsa(parts)


def isEqualMsa(genes: dict[str, Genemsa], msa: Genemsa) -> bool:
    """Assert the merged MSA is sequence-lossless vs the inputs."""
    merged_names = set(msa.alleles)
    input_names = {n for m in genes.values() for n in m.alleles}
    assert merged_names == input_names
    for m in genes.values():
        for name, seq in m.alleles.items():
            assert seq.replace("-", "") == msa.get(name).replace("-", ""), name
    return True


def mergeMSA(
    genes: dict[str, Genemsa],
    method: str = "builtin",
    tmp_prefix: str = "tmp",
    threads: int = 1,
) -> Genemsa:
    """Merge multiple gene MSAs into one by block-wise realignment."""
    blocks = splitMsaToBlocks(genes)
    blocks = realignBlock(blocks, method, tmp_prefix=tmp_prefix, threads=threads)
    msa = mergeBlockToMsa(blocks)
    isEqualMsa(genes, msa)
    return msa


def _pickRealigner(preferred: str) -> str:
    if preferred != "builtin" and not toolAvailable(preferred):
        logger.warning(f"[MSA] {preferred} not found; using builtin realigner")
        return "builtin"
    return preferred


def buildKirMsa(
    mode: str,
    prefix: str,
    db_path: str = "",
    version: str = "2100",
    input_msa_prefix: str = "",
    full_length_only: bool = True,
    mergeMSA: Callable[..., Genemsa] = mergeMSA,
    threads: int = 1,
    realign_method: str = "builtin",
) -> None:
    """Build per-gene MSAs from an IPD-KIR snapshot or existing MSA files.

    Unlike the reference (kir_msa.py:295-364) nothing is downloaded: pass
    `db_path` to a local IPD-KIR checkout (msa/ipd.py reads it) or
    `input_msa_prefix` pointing at saved MSAs.
    """
    if input_msa_prefix:
        genes = readFromMSAs(input_msa_prefix)
        genes = removeBackbone(genes)
    else:
        from .ipd import readIpdKirDB

        genes = readIpdKirDB(
            db_path, full_length_only=full_length_only, version=version
        )
        if not full_length_only:
            genes = fillMissingIntrons(genes)

    # from IPD v2.12 2DL5 coexists with 2DL5A/B
    if "KIR2DL5" in genes and "KIR2DL5A" in genes:
        genes.pop("KIR2DL5A")
        genes.pop("KIR2DL5B", None)  # checkout may ship only the A file

    method = _pickRealigner(realign_method)
    if mode == "split":
        if "KIR2DL5" in genes:
            genes["KIR2DL5A"] = genes["KIR2DL5"].select_allele("KIR2DL5A.*")
            genes["KIR2DL5B"] = genes["KIR2DL5"].select_allele("KIR2DL5B.*")
            del genes["KIR2DL5"]
    elif mode == "ab":
        pass  # 2DL5A/B already together in one MSA
    elif mode == "merge":
        genes = {
            "KIR": mergeMSA(
                genes, method=method, tmp_prefix=prefix + ".tmp", threads=threads
            )
        }
    elif mode == "ab_2dl1s1":
        to_merge = {}
        for g in ("KIR2DL1", "KIR2DS1"):
            if g in genes:
                to_merge[g] = genes.pop(g)
        if to_merge:
            genes["KIR2DL1S1"] = mergeMSA(
                to_merge, method=method, tmp_prefix=prefix + ".tmp", threads=threads
            )
    else:
        raise NotImplementedError(mode)

    saveAllMsa(genes, prefix)
