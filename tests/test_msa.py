import numpy as np
import pytest

from kir_graph_tpu.msa.genemsa import Block, Genemsa, concatMsa
from kir_graph_tpu.utils import getAlleleField, getCommonName, limitAlleleField


def smallMsa() -> Genemsa:
    msa = Genemsa(
        gene_name="KIRX",
        blocks=[Block("5UTR", "five_prime_UTR", 4), Block("exon1", "exon", 6)],
    )
    msa.append("KIRX*0010101", "ACGTACGTAC")
    msa.append("KIRX*0010102", "ACGTACTTAC")
    msa.append("KIRX*0020101", "ACG-ACGTAC")
    return msa


def test_basic_accessors():
    msa = smallMsa()
    assert msa.get_length() == 10
    assert len(msa) == 3
    assert msa.get("KIRX*0010102")[6] == "T"
    assert "KIRX*0010101" in msa


def test_consensus_and_backbone():
    msa = smallMsa()
    cons = msa.get_consensus(include_gap=False)
    assert len(cons) == 10
    assert set(cons) <= set("ACGT")
    assert cons == "ACGTACGTAC"  # majority everywhere


def test_select_and_blocks():
    msa = smallMsa()
    fam1 = msa.select_allele(r"KIRX\*001.*")
    assert len(fam1) == 2
    parts = msa.split_block()
    assert [p.get_length() for p in parts] == [4, 6]
    assert parts[1].blocks[0].type == "exon"
    assert msa.get_block_interval("exon1") == (4, 10)
    exon = msa.select_exon()
    assert exon.get_length() == 6


def test_concat_union_of_alleles():
    msa = smallMsa()
    parts = msa.split_block()
    parts[1].remove_allele(["KIRX*0020101"])
    merged = concatMsa(parts)
    assert merged.get("KIRX*0020101") == "ACG-" + "-" * 6
    assert merged.get_length() == 10


def test_shrink_removes_all_gap_columns():
    msa = Genemsa(gene_name="X", blocks=[Block("gene", "gene_fragment", 5)])
    msa.append("a", "AC-GT")
    msa.append("b", "AC-TT")
    out = msa.shrink()
    assert out.get_length() == 4
    assert out.get("a") == "ACGT"
    assert out.blocks[0].length == 4


def test_save_load_roundtrip(tmp_path):
    msa = smallMsa()
    msa.append("KIRX*BACKBONE", msa.get_consensus())
    msa.set_reference("KIRX*BACKBONE")
    fa, js = str(tmp_path / "m.fa"), str(tmp_path / "m.json")
    msa.save_msa(fa, js)
    loaded = Genemsa.load_msa(fa, js)
    assert loaded.alleles == msa.alleles
    assert loaded.reference == msa.reference
    assert [b.name for b in loaded.blocks] == [b.name for b in msa.blocks]


def test_allele_field_helpers():
    assert getAlleleField("KIR3DP1*0010101", 5) == "00101"
    assert getAlleleField("KIR2DL1*0320102N", 7) == "0320102N"
    assert limitAlleleField("KIR3DP1*0010101", 3) == "KIR3DP1*001"
    assert getCommonName("data/s.00.read.r1.fq", "data/s.00.read.r2.fq") == "data/s.00.read"


def test_assume_label():
    msa = Genemsa(
        gene_name="X",
        blocks=[Block(f"b{i}", "gene_fragment", 2) for i in range(7)],
    )
    msa.assume_label("gen")
    assert [b.name for b in msa.blocks] == [
        "5UTR", "exon1", "intron1", "exon2", "intron2", "exon3", "3UTR"
    ]
