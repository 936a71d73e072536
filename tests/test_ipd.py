"""Offline IPD-KIR reader on synthetic MSF/GFF fixtures."""
import os

import pytest

from kir_graph_tpu.msa.ipd import parseGff, parseMsf, readIpdKirDB


def writeMsf(path, seqs):
    with open(path, "w") as f:
        f.write("PileUp\n\n MSF: 40 Type: N Check: 0 ..\n\n")
        for name in seqs:
            f.write(f" Name: {name} Len: 40\n")
        f.write("\n//\n\n")
        # two interleaved blocks of 20
        for start in (0, 20):
            f.write("            1         \n")  # ruler line (ignored)
            for name, seq in seqs.items():
                f.write(f"{name} {seq[start:start + 20]}\n")
            f.write("\n")


def test_parse_msf(tmp_path):
    seqs = {
        "KIR2DL1*0010101": "ACGTACGTACGTACGTACGT" + "ACGTACGTACGTACGTACGT",
        "KIR2DL1*0020101": "ACGTACGTAC..ACGTACGT" + "ACGTACGTACGTACGTACGT",
    }
    fn = str(tmp_path / "KIR2DL1_gen.msf")
    writeMsf(fn, seqs)
    out = parseMsf(fn)
    assert set(out) == set(seqs)
    assert out["KIR2DL1*0020101"][10:12] == "--"  # '.' -> '-'
    assert len(out["KIR2DL1*0010101"]) == 40


def test_read_ipd_db(tmp_path):
    msf_dir = tmp_path / "msf"
    msf_dir.mkdir()
    seqs = {
        "KIR2DL1*0010101": "A" * 40,
        "KIR2DL1*0020101": "A" * 20 + "C" * 20,
    }
    writeMsf(str(msf_dir / "KIR2DL1_gen.msf"), seqs)
    genes = readIpdKirDB(str(tmp_path))
    assert "KIR2DL1" in genes
    msa = genes["KIR2DL1"]
    assert len(msa) == 2
    assert msa.get_length() == 40


def test_read_ipd_db_with_nuc(tmp_path):
    """nuc-only alleles get E introns when exon lengths line up."""
    msf_dir = tmp_path / "msf"
    msf_dir.mkdir()
    gen = {
        "KIR2DL1*0010101": "A" * 40,
    }
    writeMsf(str(msf_dir / "KIR2DL1_gen.msf"), gen)
    # gff: single exon covering cols 11..30 (1-based), introns around
    gff_dir = tmp_path / "gff"
    gff_dir.mkdir()
    with open(str(gff_dir / "KIR2DL1.gff"), "w") as f:
        f.write("##gff-version 3\n")
        f.write("x\tipd\tfive_prime_UTR\t1\t10\t.\t+\t.\tID=u\n")
        f.write("x\tipd\texon\t11\t30\t.\t+\t.\tID=e1\n")
        f.write("x\tipd\tthree_prime_UTR\t31\t40\t.\t+\t.\tID=u2\n")
    nuc = {
        "KIR2DL1*0010101": "A" * 20,
        "KIR2DL1*0030101": "G" * 20,
    }
    writeMsf(str(msf_dir / "KIR2DL1_nuc.msf"), nuc)
    genes = readIpdKirDB(str(tmp_path), full_length_only=False)
    msa = genes["KIR2DL1"]
    assert "KIR2DL1*0030101" in msa.alleles
    seq = msa.get("KIR2DL1*0030101")
    assert seq[:10] == "E" * 10
    assert seq[10:30] == "G" * 20
    assert seq[30:] == "E" * 10


def test_missing_db_raises():
    with pytest.raises(FileNotFoundError):
        readIpdKirDB("/definitely/not/here")
