"""
MSA left-alignment: slide deletion gaps block-wise to their leftmost
equivalent placement so every allele's indels are canonical before variant
calling (behavioural port of reference msa_leftalign.py:21-184; same
worklist algorithm, same shift-acceptance rule).
"""
from __future__ import annotations

import heapq
from dataclasses import dataclass
from typing import Iterator

from ..utils import logger
from .genemsa import Genemsa, concatMsa, readFromMSAs, saveAllMsa


@dataclass(order=True)
class GapRun:
    pos: int
    length: int


def findGapRuns(seq: str) -> Iterator[GapRun]:
    """Maximal '-' runs as (start, length)."""
    pos = 0
    length = 0
    for i, c in enumerate(seq):
        if c == "-":
            length += 1
        else:
            if length:
                yield GapRun(pos, length)
            pos = i + 1
            length = 0
    if length:
        yield GapRun(pos, length)


def _diffPattern(a: str, b: str) -> list[bool]:
    return [x == y for x, y in zip(a, b)]


def findShift(ref_seq: str, seq: str, run: GapRun) -> tuple[GapRun, int] | None:
    """Largest shift (then smallest moved-prefix) for which sliding the
    bases left of the gap across (a prefix of) the gap keeps the same
    match/mismatch pattern against the reference."""
    for shift in range(run.length, 0, -1):
        if run.pos - shift < 0:
            continue
        for length in range(shift, run.length + 1):
            moved = seq[run.pos - shift : run.pos - shift + length]
            if "-" in moved:
                continue
            before = _diffPattern(ref_seq[run.pos - shift : run.pos - shift + length], moved)
            after = _diffPattern(ref_seq[run.pos : run.pos + length], moved)
            if before == after:
                return GapRun(run.pos, length), shift
    return None


def applyShift(seq: str, run: GapRun, shift: int) -> str:
    """Swap the gap prefix run with the `shift` bases preceding it."""
    return (
        seq[: run.pos - shift]
        + seq[run.pos : run.pos + run.length]
        + seq[run.pos - shift : run.pos]
        + seq[run.pos + run.length :]
    )


def leftAlign(ref_seq: str, ori_seq: str) -> str:
    """Left-align every deletion run of ori_seq against ref_seq."""
    queue = list(findGapRuns(ori_seq))
    heapq.heapify(queue)
    seq = ori_seq
    while queue:
        run = heapq.heappop(queue)
        found = findShift(ref_seq, seq, run)
        if found is None:
            continue
        moved, shift = found
        seq = applyShift(seq, moved, shift)
        heapq.heappush(queue, GapRun(moved.pos - shift, moved.length))
        if run.length != moved.length:
            heapq.heappush(
                queue, GapRun(run.pos + moved.length, run.length - moved.length)
            )
    assert seq.replace("-", "") == ori_seq.replace("-", "")
    return seq


def msaLeftAlign(msa_ori: Genemsa) -> Genemsa:
    """Left-align all alleles, block by block."""
    parts = []
    for part in msa_ori.split_block():
        ref_seq = part.get_reference()[1]
        for name, seq in list(part.items()):
            part.alleles[name] = leftAlign(ref_seq, seq)
        parts.append(part)
    return concatMsa(parts)


def genemsaLeftAlign(input_prefix: str, output_prefix: str) -> None:
    """Normalise every `{input_prefix}.{gene}` MSA to left-most gap
    placement and save under `output_prefix`, dropping the old backbone
    row so the save step rebuilds it (reference msa_leftalign.py:170-184).
    """
    out = {}
    for gene, msa in readFromMSAs(input_prefix).items():
        backbone = msa.get_reference()[0]
        if backbone != f"{gene}*BACKBONE":
            raise ValueError(
                f"{gene}: reference row is {backbone!r}, "
                f"expected {gene}*BACKBONE"
            )
        logger.info(f"[MSA] {gene}: left-aligning {len(msa)} alleles")
        out[gene] = msaLeftAlign(msa).remove_allele([backbone])
    saveAllMsa(out, output_prefix)
