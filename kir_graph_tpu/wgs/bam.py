"""
Minimal BAM reading + BAM->FASTQ (reference wgs.py:33-49,163-200, which
shells out to `samtools fastq` / `samtools view`).  Dependency-free: BGZF
is concatenated gzip members, which the stdlib gzip reader consumes
natively, and the BAM record layout is fixed little-endian structs.

Used for real-WGS cohorts delivered as mapped BAM (TWBB-style,
kg_real.py:86-96): reads come back as the original FASTQ pair, with
mate-1/mate-2 split, strand restored, and secondary/supplementary
placements dropped — matching `samtools fastq -F 0x900`.
"""
from __future__ import annotations

import gzip
import struct

from ..utils import logger

_CIGAR_OPS = "MIDNSHP=X"
_SEQ_CODES = "=ACMGRSVTWYHKDBN"
_COMP = str.maketrans("ACGTN", "TGCAN")

FLAG_PAIRED = 0x1
FLAG_REVERSE = 0x10
FLAG_MATE1 = 0x40
FLAG_MATE2 = 0x80
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800


def readBamRecords(path: str):
    """Yield (qname, flag, ref_name, pos, mapq, cigar, seq, qual) per
    alignment record, STREAMING (O(record) memory — whole-genome BAMs
    decompress to hundreds of GB).  pos is 0-based; ref_name is None
    when unmapped."""
    with gzip.open(path, "rb") as f:

        def need(n: int) -> bytes:
            b = f.read(n)
            if len(b) != n:
                raise ValueError(f"{path}: truncated BAM")
            return b

        if need(4) != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        (l_text,) = struct.unpack("<i", need(4))
        need(l_text)
        (n_ref,) = struct.unpack("<i", need(4))
        refs: list[str] = []
        for _ in range(n_ref):
            (l_name,) = struct.unpack("<i", need(4))
            refs.append(need(l_name)[:-1].decode())
            need(4)  # l_ref
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (block_size,) = struct.unpack("<i", head)
            data = need(block_size)
            (
                ref_id, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq,
                _next_ref, _next_pos, _tlen,
            ) = struct.unpack_from("<iiBBHHHiiii", data, 0)
            p = 32
            qname = data[p : p + l_read_name - 1].decode()
            p += l_read_name
            cigar = []
            for _ in range(n_cigar):
                (c,) = struct.unpack_from("<I", data, p)
                cigar.append((c >> 4, _CIGAR_OPS[c & 0xF]))
                p += 4
            nybbles = data[p : p + (l_seq + 1) // 2]
            p += (l_seq + 1) // 2
            seq = "".join(
                _SEQ_CODES[(nybbles[i // 2] >> (4 if i % 2 == 0 else 0)) & 0xF]
                for i in range(l_seq)
            )
            qual_raw = data[p : p + l_seq]
            qual = (
                "".join(chr(min(q, 93) + 33) for q in qual_raw)
                if l_seq and qual_raw[0] != 0xFF
                else "I" * l_seq
            )
            ref_name = refs[ref_id] if 0 <= ref_id < len(refs) else None
            yield qname, flag, ref_name, pos, mapq, cigar, seq, qual


def bam2fastq(bam_path: str, output_name: str) -> tuple[str, str]:
    """BAM -> {output_name}.read.{1,2}.fq.gz (primary records only,
    strand restored; reference bam2fastqViaSamtools, kg_wgs.py)."""
    from ..sim.reads import writeFastq

    # pairs emit as soon as both mates are seen (pop on completion):
    # memory holds only the not-yet-matched mates, so name-collated BAMs
    # stream in O(1) and position-sorted ones in O(insert-size window)
    pending: dict[str, tuple[int, str, str]] = {}
    names, r1, q1, r2, q2 = [], [], [], [], []
    n_rec = 0
    for qname, flag, _ref, _pos, _mapq, _cig, seq, qual in readBamRecords(
        bam_path
    ):
        if flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY):
            continue
        n_rec += 1
        if flag & FLAG_REVERSE:
            seq = seq.translate(_COMP)[::-1]
            qual = qual[::-1]
        slot = 1 if (flag & FLAG_MATE2) else 0
        other = pending.pop(qname, None)
        if other is None:
            pending[qname] = (slot, seq, qual)
            continue
        oslot, oseq, oqual = other
        if oslot == slot:          # duplicate mate: keep first, re-stash
            pending[qname] = other
            continue
        m1 = (seq, qual) if slot == 0 else (oseq, oqual)
        m2 = (seq, qual) if slot == 1 else (oseq, oqual)
        names.append(qname)
        r1.append(m1[0])
        q1.append(m1[1])
        r2.append(m2[0])
        q2.append(m2[1])
    n_orphan = len(pending)
    out1 = f"{output_name}.read.1.fq.gz"
    out2 = f"{output_name}.read.2.fq.gz"
    writeFastq(out1, names, r1, q1)
    writeFastq(out2, names, r2, q2)
    logger.info(
        f"[WGS] bam2fastq {bam_path}: {len(names)} pairs "
        f"({n_rec} primary records, {n_orphan} orphans dropped)"
    )
    return out1, out2
