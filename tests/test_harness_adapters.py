"""Sakaue / KPI / PING adapter logic on canned tool outputs (the
container stages themselves are engine-gated; everything computational is
exercised here — VERDICT round-1 item 7)."""
import gzip
import os

import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.harness.external import KpiTool, PingTool
from kir_graph_tpu.harness.sakaue import (
    PLOIDY_GENELIST,
    SakaueKirTool,
    callGenotype,
    getPloidy,
)


# ---------------------------------------------------------------------------
# Sakaue

def test_sakaue_get_coverage(tmp_path):
    """DiagnoseTargets VCF -> length-weighted per-gene depth."""
    vcf = tmp_path / "s.coverage.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts\n"
        "KIR2DL1\t1\t.\tC\t<DT>\t.\tPASS\tEND=101;IDP=10.0;IGC=0.6\tIDP\t10.0\n"
        "KIR2DL1\t101\t.\tC\t<DT>\t.\tPASS\tEND=401;IDP=40.0;IGC=0.6\tIDP\t40.0\n"
        "KIR3DL3\t1\t.\tC\t<DT>\t.\tPASS\tEND=201;IDP=20.0;IGC=0.6\tIDP\t20.0\n"
    )
    tool = SakaueKirTool()
    out = tool.getCoverage(str(tmp_path / "s.coverage"))
    df = pd.read_csv(out + ".csv", header=None, index_col=0)
    # KIR2DL1: (10*100 + 40*300) / 400 = 32.5
    assert df.loc["KIR2DL1", 1] == pytest.approx(32.5)
    assert df.loc["KIR3DL3", 1] == pytest.approx(20.0)


def test_sakaue_ploidy_kde():
    """3DL3-normalised ratio cohort -> KDE thresholds -> integer CN."""
    rng = np.random.Generator(np.random.Philox(5))
    n = 48
    rows, truth = {}, {}
    for g in PLOIDY_GENELIST:
        # the binning is relative: pd.cut(labels=False) indexes the KDE's
        # density modes from 0 (reference sakauekir_cn.py:36-53), so CN is
        # recovered only when the cohort represents every CN level — give
        # each gene samples at CN 0..3
        cns = np.repeat([0, 1, 2, 3], n // 4)
        rng.shuffle(cns)
        truth[g] = cns.copy()
        rows[g] = cns / 2 + rng.normal(0, 0.02, n)
    cov = pd.DataFrame(rows).T
    cov.columns = [f"s{i}" for i in range(n)]
    ploidy = getPloidy(cov).fillna(0).astype(int)  # as ploidyEstimate does
    for g in PLOIDY_GENELIST:
        got = np.asarray(ploidy.loc[g], dtype=int)
        assert (got == truth[g]).mean() == 1.0, (g, got, truth[g])


def _writeDifpos(path, alleles, rows):
    with open(path, "w") as f:
        f.write("#POS\tREF\tALT\t" + "\t".join(alleles) + "\n")
        for pos, ref, alt, doses in rows:
            f.write(f"{pos}\t{ref}\t{alt}\t" + "\t".join(map(str, doses)) + "\n")


def _writeGvcf(path, gene, sample, rows):
    with gzip.open(path, "wt") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write(f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}\n")
        for pos, ref, alt, gt, filt in rows:
            f.write(
                f"{gene}\t{pos}\t.\t{ref}\t{alt}\t30\t{filt}\t.\tGT:DP\t{gt}:10\n"
            )


def test_sakaue_call_known(tmp_path):
    """Sample dose exactly matches allele pair 001+003 -> 'known'."""
    gene = "KIR2DL1"
    difpos = str(tmp_path / "difpos.txt")
    # allele dose vectors over 3 panel SNPs
    _writeDifpos(difpos, ["KIR2DL1_001", "KIR2DL1_002", "KIR2DL1_003"], [
        (100, "A", "G", [1, 0, 0]),
        (200, "C", "T", [0, 1, 1]),
        (300, "G", "A", [0, 0, 1]),
    ])
    vcf = str(tmp_path / "s.g.vcf.gz")
    # truth = 001 + 003 -> doses: pos100=1, pos200=1, pos300=1
    _writeGvcf(vcf, gene, "s0", [
        (100, "A", "G", "0/1", "PASS"),
        (200, "C", "T", "1/0", "PASS"),
        (300, "G", "A", "0/1", "PASS"),
    ])
    genotype, flag = callGenotype(
        vcf, difpos, gene, "s0",
        dosage_out=str(tmp_path / "d.tsv"), reference_out=str(tmp_path / "r.tsv"),
    )
    assert flag == "known"
    assert "KIR2DL1_001" in genotype and "KIR2DL1_003" in genotype
    assert os.path.exists(str(tmp_path / "d.tsv"))


def test_sakaue_call_flip_and_nonref(tmp_path):
    """OPP (ref/alt swapped) and <NON_REF> rows map onto the panel."""
    gene = "KIR2DL2"
    difpos = str(tmp_path / "difpos.txt")
    _writeDifpos(difpos, ["KIR2DL2_001", "KIR2DL2_002"], [
        (100, "A", "G", [1, 0]),
        (200, "C", "T", [0, 1]),
    ])
    vcf = str(tmp_path / "s.g.vcf.gz")
    # homozygous 001/001: pos100 appears FLIPPED in the VCF (ref G, alt A;
    # 001 carries G so alt dose 0), pos200 appears as a reference block
    # (<NON_REF>, no T) — both map onto the panel orientation
    _writeGvcf(vcf, gene, "s0", [
        (100, "G", "A", "0/0", "PASS"),
        (200, "C", "<NON_REF>", "0/0", "PASS"),
    ])
    genotype, flag = callGenotype(vcf, difpos, gene, "s0")
    assert flag == "known"
    assert genotype == "KIR2DL2_001/KIR2DL2_001"


def test_sakaue_call_novel(tmp_path):
    """No combination matches -> potentially_novel with closest set."""
    gene = "KIR2DL3"
    difpos = str(tmp_path / "difpos.txt")
    _writeDifpos(difpos, ["KIR2DL3_001", "KIR2DL3_002"], [
        (100, "A", "G", [1, 0]),
        (200, "C", "T", [0, 1]),
    ])
    vcf = str(tmp_path / "s.g.vcf.gz")
    _writeGvcf(vcf, gene, "s0", [
        (100, "A", "G", "1/1", "PASS"),
        (200, "C", "T", "1/1", "PASS"),  # dose (2,2) unreachable at ploidy 2
    ])
    genotype, flag = callGenotype(vcf, difpos, gene, "s0")
    assert flag == "potentially_novel"
    assert genotype.startswith("Close_to_")


def test_sakaue_read_result(tmp_path):
    tsv = tmp_path / "m.tsv"
    tsv.write_text(
        "s0\tKIR2DL1\tKIR2DL1_001/KIR2DL1_003-KIR2DL1_004\tknown\n"
        "s0\tKIR2DL2\tClose_to_KIR2DL2_001/KIR2DL2_002[score=1.0]"
        "\tpotentially_novel\n"
    )
    name_id, alleles = SakaueKirTool.readResult(str(tsv))
    assert name_id == "s0"
    assert alleles == [
        "KIR2DL1*001", "KIR2DL1*003", "KIR2DL2*001", "KIR2DL2*002",
    ]
    _, all_alleles = SakaueKirTool.readResult(str(tsv), select_all=True)
    assert "KIR2DL1*004" in all_alleles


# ---------------------------------------------------------------------------
# KPI

def test_kpi_merge_result(tmp_path):
    index = tmp_path / "kpi_idx"
    (index / "input").mkdir(parents=True)
    haps = index / "input" / "haps.txt"
    haps.write_text(
        "haplotype\tnomenclature\tJiang 2012 freq\tstructure\t3DL3\t2DL1\t2DS1\n"
        "1\tcA01~tA01\t0.3\tx\t1\t1\t0\n"
        "2\tcB01~tB01\t0.2\tx\t1\t0\t1\n"
    )
    d = tmp_path / "data"
    d.mkdir()
    pat = str(d / "c.{}.kpi_prediction")
    with open(pat.format("00") + ".txt", "w") as f:
        f.write("sample\thaplotypes\nc00\tcA01~tA01+cB01~tB01|alt\n")
    tool = KpiTool()
    tool.file_adapter.setPattern(pat)
    out = tool.mergeResult(pat, index=str(index))
    allele = pd.read_csv(out + ".tsv", sep="\t")
    got = sorted(allele["alleles"][0].split("_"))
    assert got == ["KIR2DL1", "KIR2DS1", "KIR3DL3", "KIR3DL3"]
    cn = pd.read_csv(
        tool.replaceWildcard(pat, "_merge_cn") + ".csv"
    ).set_index("gene")
    assert cn.loc["KIR3DL3", "00"] == 2
    assert cn.loc["KIR2DL1", "00"] == 1


# ---------------------------------------------------------------------------
# PING

def test_ping_read_allele_and_merge(tmp_path):
    result = tmp_path / "res"
    result.mkdir()
    (result / "finalAlleleCalls.csv").write_text(
        "name,KIR3DP1,KIR2DS35\n"
        "id.00,KIR3DP1*026+KIR3DP1*null,KIR2DS3*009+KIR2DS5*02701\n"
        "id.01,KIR3DP1*00302+KIR3DP1*03201 KIR3DP1*00304,failed\n"
    )
    data = PingTool.readAllele(str(result / "finalAlleleCalls.csv"))
    assert data["00"] == ["KIR3DP1*026", "KIR2DS3*009", "KIR2DS5*02701"]
    assert data["01"] == ["KIR3DP1*00302", "KIR3DP1*03201"]

    tool = PingTool()
    out = tool.mergeResult(str(result))
    df = pd.read_csv(out + ".tsv", sep="\t")
    assert len(df) == 2
    assert df[df["id"] == 0].iloc[0]["alleles"].count("*") == 3


def test_ping_migrate_and_depth_ratio(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    os.makedirs("data")
    pat = os.path.join("data", "c.{}")
    for sid in ("00", "01"):
        for r in (1, 2):
            open(f"data/c.{sid}.read.{r}.fq.gz", "w").write("x")
    tool = PingTool()
    tool.file_adapter.setPattern(pat)
    folder = tool.migrateSample(pat)
    files = sorted(os.listdir(folder))
    assert files == [
        "id.00.read.1.fq.gz", "id.00.read.2.fq.gz",
        "id.01.read.1.fq.gz", "id.01.read.2.fq.gz",
    ]
    # symlinks resolve
    assert open(os.path.join(folder, files[0])).read() == "x"

    pd.DataFrame(
        {"Unnamed: 0": ["id.00", "id.01"], "KIR2DL1": [0.5, 1.0]}
    ).to_csv("locusRatioFrame.csv", index=False)
    df = PingTool.readGeneDepthRatio("locusRatioFrame.csv")
    assert list(df["id"]) == ["00", "01"]
    assert "KIR2DL1" in df.columns


def test_ping_calc_threshold():
    """Rank-paired CN cuts (reference research/other_kir.py:414-436
    docstring example, traced through the exact midpoint rule)."""
    cuts = PingTool.calcThreshold(
        [0, 0.5, 0.5, 1.5, 1.5], [0.1, 0.2, 0.21, 0.4, 0.5])
    assert cuts == pytest.approx([0.15, 0.305, 0.305, 1.0])
    # all-zero gene: single cut past the last ratio
    assert PingTool.calcThreshold([0, 0], [0.0, 0.01]) == pytest.approx([0.51])


def test_ping_predict_cn_by_answer(tmp_path):
    """Answer cohort + locusRatioFrame -> manualCopyThresholds.csv with
    3DL3 dropped and per-CN-step columns."""
    folder = tmp_path / "res"
    folder.mkdir()
    pd.DataFrame({
        "Unnamed: 0": ["id.00", "id.01", "id.02"],
        "KIR2DL1": [0.24, 0.52, 0.55],
        "KIR3DL3": [1.0, 1.0, 1.0],
    }).to_csv(folder / "locusRatioFrame.csv", index=False)
    answer = tmp_path / "answer.tsv"
    pd.DataFrame([
        # 3DL3 always diploid; 2DL1 CN = 1, 2, 2
        {"id": "00", "alleles": "KIR3DL3*001_KIR3DL3*001_KIR2DL1*001"},
        {"id": "01", "alleles": "KIR3DL3*001_KIR3DL3*001_KIR2DL1*001_KIR2DL1*002"},
        {"id": "02", "alleles": "KIR3DL3*001_KIR3DL3*001_KIR2DL1*001_KIR2DL1*003"},
    ]).to_csv(answer, index=False, sep="\t")

    tool = PingTool()
    df = tool.predictCNByAnswer(str(folder), str(answer))
    assert list(df["gene"]) == ["KIR2DL1"]
    row = df.iloc[0]
    # CN0->1 cut never seen (min CN is 1): first cut is 0-1 at ratio/2
    assert float(row["0-1"]) == pytest.approx(0.12)
    assert float(row["1-2"]) == pytest.approx((0.24 + 0.52) / 2)
    assert float(row["2-3"]) == pytest.approx(1.05)
    assert row["3-4"] == "NA"
    out = pd.read_csv(folder / "manualCopyThresholds.csv")
    assert "KIR3DL3" not in set(out["gene"])


def test_ping_calc_threshold_unsorted_terminates():
    """Non-monotonic (sample-paired) inputs are rank-paired internally
    instead of hanging (review finding: the reference algorithm assumes
    ascending answers)."""
    cuts = PingTool.calcThreshold([1.0, 0.5], [0.4, 0.45])
    # rank pairing: ans [1,2] halves -> [0.5, 1.0]; cn 1 cut at 0.2, cn 2
    # cut at midpoint(0.4, 0.45), closing cut at 0.45+0.5
    assert cuts == pytest.approx([0.2, 0.425, 0.95])


def test_ping_predict_cn_handles_nan_and_disjoint(tmp_path):
    """A per-gene NaN ratio drops the sample from both rank lists (not a
    shifted zip); fully disjoint cohorts return an empty table."""
    folder = tmp_path / "res"
    folder.mkdir()
    pd.DataFrame({
        "Unnamed: 0": ["id.00", "id.01", "id.02"],
        "KIR2DL1": [0.24, float("nan"), 0.55],
    }).to_csv(folder / "locusRatioFrame.csv", index=False)
    answer = tmp_path / "answer.tsv"
    pd.DataFrame([
        {"id": "00", "alleles": "KIR2DL1*001"},
        {"id": "01", "alleles": "KIR2DL1*001_KIR2DL1*002"},
        {"id": "02", "alleles": "KIR2DL1*001_KIR2DL1*003"},
    ]).to_csv(answer, index=False, sep="\t")
    tool = PingTool()
    df = tool.predictCNByAnswer(str(folder), str(answer), save=False)
    # sample 01 dropped on both sides: ans halves [0.5, 1.0] with ratios
    # [0.24, 0.55] -> cuts 0.12 (0->1), 0.395 (1->2)
    row = df.iloc[0]
    assert float(row["0-1"]) == pytest.approx(0.12)
    assert float(row["1-2"]) == pytest.approx((0.24 + 0.55) / 2)

    pd.DataFrame([
        {"id": "99", "alleles": "KIR2DL1*001"},
    ]).to_csv(answer, index=False, sep="\t")
    empty = tool.predictCNByAnswer(str(folder), str(answer), save=False)
    assert len(empty) == 0 and "gene" in empty.columns
