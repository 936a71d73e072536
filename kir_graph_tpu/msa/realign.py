"""
Builtin multiple-sequence realignment (center-star, banded NW).

The reference shells out to MUSCLE/ClustalO to realign each gene block when
merging genes (kir_msa.py:132-153, 252-292).  Those binaries aren't a given
in this environment, so this module provides a self-contained center-star
aligner tuned for the actual workload: highly similar sequences (same gene
block across genes/alleles), where a banded global alignment against a
center sequence captures nearly all signal.  MUSCLE/ClustalO remain
available through exec_tools when installed.
"""
from __future__ import annotations

import numpy as np

from ..utils import logger

_GAP = 2.5
_MISMATCH = 1.0
_BIG = np.float32(1e9)


def _bandedNW(a: np.ndarray, b: np.ndarray, band: int) -> tuple[list, list]:
    """Banded global alignment of b against a (linear gap cost).

    State (i, j) stored at column k = j - i + band; one vectorised row
    update per i (diag/up from the previous row by shifts, in-row left
    relaxation as a running min).  Returns (a_idx, b_idx) aligned index
    lists with -1 for gaps.
    """
    la, lb = len(a), len(b)
    width = 2 * band + 1
    ks = np.arange(width)
    score = np.full((la + 1, width), _BIG, dtype=np.float32)

    # row 0: only left moves (gaps in a consuming b): j = k - band
    j0 = ks - band
    ok0 = (j0 >= 0) & (j0 <= lb)
    score[0, ok0] = _GAP * j0[ok0]

    gap_k = _GAP * ks
    for i in range(1, la + 1):
        j = i + ks - band                       # j at column k, this row
        valid = (j >= 0) & (j <= lb)
        jm1 = np.clip(j - 1, 0, lb - 1)
        sub = np.where(b[jm1] == a[i - 1], 0.0, _MISMATCH).astype(np.float32)
        diag = score[i - 1] + np.where(j >= 1, sub, _BIG)
        up = np.concatenate([score[i - 1, 1:], [_BIG]]) + _GAP
        tmp = np.minimum(diag, up)
        # left relaxation: row[k] = min_{k'<=k} tmp[k'] + GAP*(k-k')
        row = np.minimum.accumulate(tmp - gap_k) + gap_k
        row[~valid] = _BIG
        score[i] = row

    # greedy traceback by re-checking which transition produced the score
    i, j = la, lb
    a_idx: list[int] = []
    b_idx: list[int] = []
    eps = 1e-3
    while i > 0 or j > 0:
        k = j - i + band
        s = score[i, k]
        if (
            i > 0
            and j > 0
            and abs(
                score[i - 1, k]
                + (0.0 if a[i - 1] == b[j - 1] else _MISMATCH)
                - s
            ) < eps
        ):
            a_idx.append(i - 1)
            b_idx.append(j - 1)
            i -= 1
            j -= 1
        elif i > 0 and k + 1 < width and abs(score[i - 1, k + 1] + _GAP - s) < eps:
            a_idx.append(i - 1)
            b_idx.append(-1)
            i -= 1
        elif j > 0 and k - 1 >= 0 and abs(score[i, k - 1] + _GAP - s) < eps:
            a_idx.append(-1)
            b_idx.append(j - 1)
            j -= 1
        elif i > 0:
            a_idx.append(i - 1)
            b_idx.append(-1)
            i -= 1
        else:
            a_idx.append(-1)
            b_idx.append(j - 1)
            j -= 1
    return a_idx[::-1], b_idx[::-1]


def centerStarAlign(records: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Align all sequences via pairwise banded NW against the longest one,
    merging per-pair insertions into a common column space."""
    if not records:
        return []
    names = [n for n, _ in records]
    seqs = [np.frombuffer(s.encode(), dtype=np.uint8) for _, s in records]
    lens = [len(s) for s in seqs]
    center = int(np.argmax(lens))
    c = seqs[center]
    lc = len(c)

    max_diff = max(abs(l - lc) for l in lens)
    band = max(32, max_diff + 16)

    # per-center-position max insertions before position i (and at end)
    ins_before = np.zeros(lc + 1, dtype=int)
    alignments = []
    for si, s in enumerate(seqs):
        if si == center:
            alignments.append(None)
            continue
        a_idx, b_idx = _bandedNW(c, s, band)
        alignments.append((a_idx, b_idx))
        run = 0
        pos = 0
        for ai in a_idx:
            if ai == -1:
                run += 1
            else:
                ins_before[ai] = max(ins_before[ai], run)
                run = 0
                pos = ai + 1
        ins_before[lc] = max(ins_before[lc], run)

    # column layout: ins_before[i] insertion columns precede center pos i
    col_of = np.zeros(lc, dtype=int)
    total = 0
    for i in range(lc):
        total += ins_before[i]
        col_of[i] = total
        total += 1
    width = total + ins_before[lc]

    out = []
    for si, s in enumerate(seqs):
        row = np.full(width, ord("-"), dtype=np.uint8)
        if si == center:
            row[col_of] = c
        else:
            a_idx, b_idx = alignments[si]
            pending: list[int] = []
            for ai, bi in zip(a_idx, b_idx):
                if ai == -1:
                    if bi != -1:
                        pending.append(bi)  # inserted base vs center
                    continue
                col = col_of[ai]
                # inserted bases sit right-aligned in the reserved columns
                for r, bpos in enumerate(reversed(pending)):
                    row[col - 1 - r] = s[bpos]
                pending = []
                if bi != -1:
                    row[col] = s[bi]
            for r, bpos in enumerate(reversed(pending)):
                row[width - 1 - r] = s[bpos]
        out.append((names[si], row.tobytes().decode()))

    # sanity: realignment must be content-lossless
    for (name, aligned), (_, orig) in zip(out, records):
        assert aligned.replace("-", "") == orig, f"realign lost bases for {name}"
    return out
