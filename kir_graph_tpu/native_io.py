"""
ctypes binding for the native FASTQ loader (native/fastq_reader.cpp) with a
pure-Python fallback.  `loadFastqEncoded(path)` returns the aligner's
(codes [N, max_len] int8, lengths [N] int32) layout directly.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

from .align.encode import MAX_READ_LEN, encodeReads
from .utils import logger

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "native", "libkgt.so"),
    os.path.join(os.path.dirname(__file__), "libkgt.so"),
]

_lib = None


def _buildLib() -> None:
    """Build native/libkgt.so in place if a toolchain is available (a
    fresh checkout has only the sources; the annotator and FASTQ loader
    are ~5-100x faster through it)."""
    src_dir = os.path.join(os.path.dirname(__file__), "..", "native")
    if not os.path.exists(os.path.join(src_dir, "Makefile")):
        return
    import shutil
    import subprocess

    if not (shutil.which("make") and shutil.which("g++")):
        return
    logger.info("[IO] building native/libkgt.so")
    try:
        subprocess.run(
            ["make", "-C", src_dir], check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE, timeout=120,
        )
    except (subprocess.SubprocessError, OSError) as e:  # pragma: no cover
        logger.warning(f"[IO] native build failed: {e}")


def _loadLib():
    global _lib
    if _lib is not None:
        return _lib
    if not any(os.path.exists(p) for p in _LIB_PATHS):
        _buildLib()
    return _tryLoadPaths(rebuild_on_error=True)


def _tryLoadPaths(rebuild_on_error: bool = False):
    global _lib
    for p in _LIB_PATHS:
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(os.path.abspath(p))
                lib.kgt_open.restype = ctypes.c_long
                lib.kgt_open.argtypes = [ctypes.c_char_p]
                lib.kgt_num_reads.restype = ctypes.c_long
                lib.kgt_num_reads.argtypes = [ctypes.c_long]
                lib.kgt_fill.restype = ctypes.c_long
                lib.kgt_fill.argtypes = [
                    ctypes.c_long,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.POINTER(ctypes.c_int32),
                    ctypes.c_long,
                ]
                lib.kgt_pack2bit.restype = None
                lib.kgt_pack2bit.argtypes = [
                    ctypes.POINTER(ctypes.c_int8),
                    ctypes.c_long,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8),
                ]
                _lib = lib
                return lib
            except OSError as e:  # pragma: no cover
                logger.warning(f"[IO] failed to load {p}: {e}")
                if rebuild_on_error:
                    # a stale/corrupt .so (e.g. from a killed build of an
                    # older Makefile) should not disable the native path
                    # forever: rebuild once and retry
                    try:
                        os.remove(p)
                    except OSError:
                        pass
                    _buildLib()
                    return _tryLoadPaths(rebuild_on_error=False)
    _lib = False
    return _lib


def nativeAvailable() -> bool:
    return bool(_loadLib())


def loadFastqEncoded(
    path: str, max_len: int = MAX_READ_LEN
) -> tuple[np.ndarray, np.ndarray]:
    """FASTQ(.gz) -> (codes [N, max_len] int8, lens [N] int32)."""
    lib = _loadLib()
    if not lib:
        from .sim.reads import readFastq

        _, seqs = readFastq(path)
        return encodeReads(seqs, max_len=max_len)

    handle = lib.kgt_open(path.encode())
    if handle < 0:
        raise FileNotFoundError(path)
    n = lib.kgt_num_reads(handle)
    codes = np.full((n, max_len), 4, dtype=np.int8)
    lens = np.zeros(n, dtype=np.int32)
    got = lib.kgt_fill(
        handle,
        max_len,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
    )
    assert got == n, f"short read: {got} != {n}"
    return codes, lens


def finalizeColsNative(
    easy: np.ndarray,       # [J] uint8
    gene: np.ndarray,       # [J] int32 pseudo-row ids
    w0: np.ndarray,         # [J] int32
    off: np.ndarray,        # [J] int32
    lens: np.ndarray,       # [J] int32
    start_col,              # [J] int32 or None (all-easy call)
    delta,                  # [J, >=RL] int8 or None (row stride may
    #                         exceed RL: packed traceback trailer bytes)
    glen: np.ndarray,       # [G] int64
    row_pos: np.ndarray,    # [G] int64
    row_len: np.ndarray,    # [G] int64
    dest_row: np.ndarray,   # [J] int64
    dest_which: np.ndarray, # [J] uint8
    dst0: np.ndarray,       # [N, RL] int32
    dst1: np.ndarray,       # [N, RL] int32
) -> bool:
    """Threaded traceback-column finalize (native/annotate.cpp
    kgt_finalize_cols).  Returns False when the native lib is absent or
    disabled; the caller then runs its numpy fallback."""
    lib = _loadLib()
    if (
        not lib
        or not hasattr(lib, "kgt_finalize_cols")
        or os.environ.get("KGT_NO_NATIVE")
    ):
        return False
    for a, dt in (
        (easy, np.uint8), (gene, np.int32), (w0, np.int32),
        (off, np.int32), (lens, np.int32), (start_col, np.int32),
        (glen, np.int64), (row_pos, np.int64), (row_len, np.int64),
        (dest_row, np.int64), (dest_which, np.uint8),
        (dst0, np.int32), (dst1, np.int32),
    ):
        if a is not None and (a.dtype != dt or not a.flags.c_contiguous):
            return False
    if delta is not None and delta.dtype != np.int8:
        return False

    def p(a, ct):
        return None if a is None else a.ctypes.data_as(ctypes.POINTER(ct))

    i8, i32, i64, u8 = (
        ctypes.c_int8, ctypes.c_int32, ctypes.c_int64, ctypes.c_uint8,
    )
    if delta is not None:
        if delta.strides[1] != delta.itemsize:
            # some backends hand back non-C layouts from sliced downloads
            delta = np.ascontiguousarray(delta)
        dstride = delta.strides[0]
    else:
        dstride = dst0.shape[1]
    lib.kgt_finalize_cols(
        ctypes.c_int64(len(easy)), ctypes.c_int32(dst0.shape[1]),
        ctypes.c_int64(dstride),
        p(easy, u8), p(gene, i32), p(w0, i32), p(off, i32), p(lens, i32),
        p(start_col, i32), p(delta, i8),
        p(glen, i64), p(row_pos, i64), p(row_len, i64),
        p(dest_row, i64), p(dest_which, u8), p(dst0, i32), p(dst1, i32),
    )
    return True


def orientRowsNative(
    codes: np.ndarray,   # [n, L] int8
    lens: np.ndarray,    # [n] int32
    flags: np.ndarray,   # [n] uint8 (1 -> reverse-complement)
    out: np.ndarray,     # [n, L] int8
) -> bool:
    """Winner-oriented read buffer in one threaded native pass
    (native/annotate.cpp kgt_orient_rows).  Returns False when the
    native lib is absent/disabled; the caller runs its numpy fallback."""
    lib = _loadLib()
    if (
        not lib
        or not hasattr(lib, "kgt_orient_rows")
        or os.environ.get("KGT_NO_NATIVE")
    ):
        return False
    for a, dt in (
        (codes, np.int8), (lens, np.int32),
        (flags, np.uint8), (out, np.int8),
    ):
        if a.dtype != dt or not a.flags.c_contiguous:
            return False
    n, L = codes.shape
    # the native pass writes through raw pointers — a mismatch the old
    # numpy path rejected loudly must not become silent OOB writes
    if out.shape != (n, L) or lens.shape != (n,) or flags.shape != (n,):
        return False
    lib.kgt_orient_rows(
        ctypes.c_int64(n), ctypes.c_int32(L),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return True


def packUploadNative(
    codes1: np.ndarray, codes2: np.ndarray,
    len1: np.ndarray, len2: np.ndarray,
    out: np.ndarray,
) -> bool:
    """Fill the aligner's fused upload buffer [2n, L/2+2] (nibble-packed
    codes + 2-byte length trailer) in one threaded native pass.  Returns
    False when the native lib is absent/disabled or L is odd."""
    lib = _loadLib()
    n, L = codes1.shape
    if (
        not lib
        or not hasattr(lib, "kgt_pack_reads")
        or os.environ.get("KGT_NO_NATIVE")
        or L % 2
    ):
        return False
    for a, dt in (
        (codes1, np.int8), (codes2, np.int8),
        (len1, np.int32), (len2, np.int32), (out, np.uint8),
    ):
        if a.dtype != dt or not a.flags.c_contiguous:
            return False
    lib.kgt_pack_reads(
        ctypes.c_int64(n), ctypes.c_int32(L),
        codes1.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        codes2.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        len1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return True


def packUpload2bitNative(
    codes1: np.ndarray, codes2: np.ndarray,
    len1: np.ndarray, len2: np.ndarray,
    out: np.ndarray, exc: np.ndarray,
) -> int:
    """Fill the 2-bit upload buffer [2n, L/4+2] + the N-base exception
    list in one threaded native pass.  Returns the TOTAL N count (may
    exceed len(exc) — caller falls back to nibbles then), or -1 when
    the native lib is absent/disabled or L % 4 != 0."""
    lib = _loadLib()
    n, L = codes1.shape
    if (
        not lib
        or not hasattr(lib, "kgt_pack_reads2")
        or os.environ.get("KGT_NO_NATIVE")
        or L % 4
        # the native exception index is int32 (read*L + pos); a raised
        # KGT_CHUNK_PAIRS could overflow it and silently corrupt the
        # N-restoration scatter -> take the lossless nibble fallback
        or 2 * n * L > np.iinfo(np.int32).max
    ):
        return -1
    for a, dt in (
        (codes1, np.int8), (codes2, np.int8),
        (len1, np.int32), (len2, np.int32),
        (out, np.uint8), (exc, np.int32),
    ):
        if a.dtype != dt or not a.flags.c_contiguous:
            return -1
    lib.kgt_pack_reads2.restype = ctypes.c_int64
    return int(lib.kgt_pack_reads2(
        ctypes.c_int64(n), ctypes.c_int32(L),
        codes1.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        codes2.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        len1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        exc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(exc)),
    ))


def packReadsNative(codes: np.ndarray) -> np.ndarray:
    """2-bit pack via the native library (fallback: encode.packCodes2bit)."""
    lib = _loadLib()
    if not lib:
        from .align.encode import packCodes2bit

        return packCodes2bit(codes)
    n, L = codes.shape
    words = (L + 3) // 4
    out = np.zeros((n, words), dtype=np.uint8)
    lib.kgt_pack2bit(
        np.ascontiguousarray(codes).ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        n,
        L,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
