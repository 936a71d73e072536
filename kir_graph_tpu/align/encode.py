"""
Read batch encoding: FASTQ strings -> fixed-shape int8 arrays.

(The C++ fast path in native/ produces the same layout straight from
gzipped FASTQ; this is the portable fallback.)
"""
from __future__ import annotations

import numpy as np

from ..index.build import BASE_PAD, encodeSeq

MAX_READ_LEN = 160


def encodeReads(seqs: list[str], max_len: int = MAX_READ_LEN) -> tuple[np.ndarray, np.ndarray]:
    """-> codes [N, max_len] int8 (pad 4), lengths [N] int32."""
    n = len(seqs)
    codes = np.full((n, max_len), BASE_PAD, dtype=np.int8)
    lengths = np.zeros(n, dtype=np.int32)
    for i, s in enumerate(seqs):
        c = encodeSeq(s[:max_len])
        codes[i, : len(c)] = c
        lengths[i] = len(c)
    return codes, lengths


def packCodes2bit(codes: np.ndarray) -> np.ndarray:
    """[N, L] base codes -> [N, ceil(L/4)] uint8, 2 bits/base (N/pad -> A).

    Used to push reads through slow host->device links; unpack with
    parallel.cohort.unpackCodes2bit.
    """
    n, L = codes.shape
    Lp = -(-L // 4) * 4
    c = np.zeros((n, Lp), dtype=np.uint8)
    c[:, :L] = np.where(codes >= 4, 0, codes).astype(np.uint8)
    c = c.reshape(n, Lp // 4, 4)
    shifts = np.array([0, 2, 4, 6], dtype=np.uint8)
    return (c << shifts).sum(axis=2).astype(np.uint8)


def packCodes4bit(codes: np.ndarray) -> np.ndarray:
    """[N, L] int8 codes -> [N, ceil(L/2)] uint8 nibbles, LOSSLESS for
    codes 0..15 (unlike packCodes2bit, N/pad code 4 survives).

    Used by the exact aligner to halve+halve the host->device read upload
    without changing N-base or pad semantics; unpack with
    parallel.cohort.unpackCodes4bit.
    """
    n, L = codes.shape
    Lp = -(-L // 2) * 2
    c = np.zeros((n, Lp), dtype=np.uint8)
    c[:, :L] = codes.astype(np.uint8)
    c = c.reshape(n, Lp // 2, 2)
    return (c[:, :, 0] | (c[:, :, 1] << 4)).astype(np.uint8)


def revCompCodes(codes: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Reverse-complement of padded code rows (pad stays at the tail)."""
    n, m = codes.shape
    comp = np.array([3, 2, 1, 0, 4], dtype=np.int8)
    if n and lengths.min() == lengths.max():
        # uniform read length (the usual FASTQ case): one strided reverse,
        # no per-row realignment gather
        L = int(lengths[0])
        out = np.full_like(codes, BASE_PAD)
        out[:, :L] = comp[codes[:, L - 1 :: -1]]
        return out
    flipped = comp[codes[:, ::-1]]
    # row i is left-padded by (m - L); shift it back to the front
    shift = (m - lengths)[:, None]
    col = np.arange(m)[None, :]
    gathered = np.take_along_axis(flipped, np.minimum(shift + col, m - 1), axis=1)
    return np.where(col < lengths[:, None], gathered, BASE_PAD).astype(np.int8)
