"""BAM reader + bam2fastq round-trip on a hand-packed BAM file."""
import gzip
import struct

from kir_graph_tpu.wgs.bam import (
    FLAG_MATE1,
    FLAG_MATE2,
    FLAG_PAIRED,
    FLAG_REVERSE,
    FLAG_SECONDARY,
    bam2fastq,
    readBamRecords,
)

_COMP = str.maketrans("ACGTN", "TGCAN")
_SEQ_NYBBLE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}


def _packRecord(qname, flag, ref_id, pos, seq, qual):
    name_b = qname.encode() + b"\x00"
    cigar = struct.pack("<I", (len(seq) << 4) | 0)  # e.g. 100M
    nyb = bytearray()
    for i in range(0, len(seq), 2):
        hi = _SEQ_NYBBLE[seq[i]] << 4
        lo = _SEQ_NYBBLE[seq[i + 1]] if i + 1 < len(seq) else 0
        nyb.append(hi | lo)
    qual_b = bytes(ord(c) - 33 for c in qual)
    body = (
        struct.pack(
            "<iiBBHHHiiii",
            ref_id, pos, len(name_b), 30, 0, 1, flag, len(seq), -1, -1, 0,
        )
        + name_b + cigar + bytes(nyb) + qual_b
    )
    return struct.pack("<i", len(body)) + body


def _writeBam(path, records):
    refs = [("chrT", 1000)]
    payload = b"BAM\x01" + struct.pack("<i", 0)  # empty header text
    payload += struct.pack("<i", len(refs))
    for name, ln in refs:
        nb = name.encode() + b"\x00"
        payload += struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln)
    for rec in records:
        payload += _packRecord(*rec)
    with gzip.open(path, "wb") as f:
        f.write(payload)


def test_bam_roundtrip(tmp_path):
    s1a, s1b = "ACGTACGTAC", "TTGGCCAATT"
    s2a, s2b = "GGGTTTCCCA", "ACACACACGT"
    q = "IIIIHHHHGG"
    recs = [
        ("p1", FLAG_PAIRED | FLAG_MATE1, 0, 10, s1a, q),
        ("p1", FLAG_PAIRED | FLAG_MATE2 | FLAG_REVERSE, 0, 200,
         s1b.translate(_COMP)[::-1], q[::-1]),
        ("p2", FLAG_PAIRED | FLAG_MATE1, 0, 50, s2a, q),
        ("p2", FLAG_PAIRED | FLAG_MATE2, 0, 250, s2b, q),
        # secondary placement: must be dropped
        ("p1", FLAG_PAIRED | FLAG_MATE1 | FLAG_SECONDARY, 0, 400, s1a, q),
        # orphan: mate never appears
        ("p3", FLAG_PAIRED | FLAG_MATE1, 0, 70, s2b, q),
    ]
    bam = str(tmp_path / "t.bam")
    _writeBam(bam, recs)

    parsed = list(readBamRecords(bam))
    assert len(parsed) == 6
    assert parsed[0][0] == "p1" and parsed[0][2] == "chrT"
    assert parsed[0][5] == [(10, "M")]
    assert parsed[0][6] == s1a and parsed[0][7] == q

    r1, r2 = bam2fastq(bam, str(tmp_path / "out"))
    reads1 = gzip.open(r1, "rt").read().splitlines()
    reads2 = gzip.open(r2, "rt").read().splitlines()
    assert reads1[0] == "@p1" and reads1[1] == s1a and reads1[3] == q
    # mate-2 strand restored to the original orientation
    assert reads2[1] == s1b and reads2[3] == q
    assert reads1[4] == "@p2" and reads1[5] == s2a
    assert reads2[5] == s2b
    assert len(reads1) == 8  # two pairs only: secondary + orphan dropped
