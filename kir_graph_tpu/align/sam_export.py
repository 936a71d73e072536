"""
SAM text export of alignment results.

The reference keeps BAM as its interchange format (hisat2.py:869-901
saveReadsToBam); this framework's internal format is arrays, but a SAM
export lets users inspect alignments with samtools/IGV.  CIGARs are
reconstructed from the traceback columns (matches / I / D; no soft clips —
clipped reads are unmapped by construction).
"""
from __future__ import annotations

import numpy as np

from ..index.build import KirIndex, decodeSeq
from .pipeline import AlignResult


def _cigarFromCols(cols: np.ndarray, read_len: int) -> tuple[int, str]:
    """Traceback columns -> (1-based POS, CIGAR)."""
    cols = cols[:read_len]
    ops: list[tuple[int, str]] = []

    def push(op: str, n: int = 1) -> None:
        if ops and ops[-1][1] == op:
            ops[-1] = (ops[-1][0] + n, op)
        else:
            ops.append((n, op))

    start = -1
    prev_col = None
    for c in cols:
        if c == -1:
            break
        if c == -2:
            push("I")
            continue
        if start < 0:
            start = int(c)
        elif prev_col is not None and c > prev_col + 1:
            push("D", int(c - prev_col - 1))
        push("M")
        prev_col = int(c)
    cigar = "".join(f"{n}{op}" for n, op in ops) or "*"
    return start + 1, cigar


def writeSam(
    filename: str,
    result: AlignResult,
    index: KirIndex,
    names: list[str] | None = None,
    only_mapped: bool = True,
) -> None:
    """Write pairs as SAM text (sorted by reference is up to the caller)."""
    with open(filename, "w") as f:
        f.write("@HD\tVN:1.6\tSO:unsorted\n")
        for gi, gname in enumerate(index.gene_names):
            f.write(f"@SQ\tSN:{gname}\tLN:{int(index.lengths[gi])}\n")
        f.write("@PG\tID:kir_graph_tpu\tPN:kir_graph_tpu\n")

        N = len(result.gene)
        for i in range(N):
            mapped = result.gene[i] >= 0
            if only_mapped and not mapped:
                continue
            qname = names[i] if names else f"pair{i}"
            rname = index.gene_names[result.gene[i]] if mapped else "*"
            for mate, (cols, bases, lens, rc) in enumerate(
                (
                    (result.cols_l[i], result.bases_l[i], result.len_l[i], result.rc_l[i]),
                    (result.cols_r[i], result.bases_r[i], result.len_r[i], result.rc_r[i]),
                )
            ):
                flag = 1 | 2  # paired, proper pair
                flag |= 64 if mate == 0 else 128
                if rc:
                    flag |= 16
                else:
                    flag |= 32  # mate reverse (FR pairs)
                pos, cigar = _cigarFromCols(cols, int(lens)) if mapped else (0, "*")
                seq = decodeSeq(bases[: int(lens)])
                nh = int(result.nh[i])
                f.write(
                    f"{qname}\t{flag}\t{rname}\t{pos}\t"
                    f"{255 if nh == 1 else 0}\t{cigar}\t=\t0\t0\t{seq}\t*"
                    f"\tNH:i:{nh}\n"
                )
