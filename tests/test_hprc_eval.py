import pandas as pd
import pytest

from kir_graph_tpu.eval.hprc import (
    digitLength,
    evaluateHprc,
    isFusionAllele,
    readHprcTruth,
    truncateAllele,
)


def test_symbol_and_fusion_parsing():
    assert digitLength("KIR2DL1*0030218") == 7
    assert digitLength("KIR2DL3*00101$") == 5
    assert digitLength("KIR2DS2*005+") == 3
    assert digitLength("KIR3DP1*004#") == 3
    assert isFusionAllele("00101e2DP1*00201")
    assert not isFusionAllele("KIR2DS2*00104e")  # trailing exon marker only
    assert truncateAllele("KIR2DL1*0030218", 5) == "00302"
    assert digitLength("00101e2DP1*00201") == 5  # digits before fusion


def test_perfect_prediction_scores_one():
    truth = {"S1": ["KIR2DL1*0030218", "KIR2DL3*00101$"]}
    pred = {"S1": ["KIR2DL1*0030218", "KIR2DL3*0010101"]}
    df = evaluateHprc(truth, pred)
    all7 = df[(df["digits"] == 7) & (df["gene"] == "ALL")].iloc[0]
    # 2DL3 truth has only 5 digits -> excluded at 7; 2DL1 matches
    assert all7["tp"] == 1 and all7["fp"] == 0 and all7["fn"] == 0
    all5 = df[(df["digits"] == 5) & (df["gene"] == "ALL")].iloc[0]
    assert all5["tp"] == 2 and all5["recall"] == 1.0


def test_wrong_prediction_counts_fp_fn():
    truth = {"S1": ["KIR2DL1*0030218"]}
    pred = {"S1": ["KIR2DL1*0040105"]}
    df = evaluateHprc(truth, pred)
    all7 = df[(df["digits"] == 7) & (df["gene"] == "ALL")].iloc[0]
    assert all7["fp"] == 1 and all7["fn"] == 1 and all7["tp"] == 0


def test_low_resolution_pred_excluded():
    truth = {"S1": ["KIR2DL1*0030218"]}
    pred = {"S1": ["KIR2DL1*003"]}
    df = evaluateHprc(truth, pred)
    all7 = df[(df["digits"] == 7) & (df["gene"] == "ALL")].iloc[0]
    assert all7["fp"] == 0  # low-res pred excluded from precision
    assert all7["fn"] == 1  # but truth at 7 digits is missed
    all3 = df[(df["digits"] == 3) & (df["gene"] == "ALL")].iloc[0]
    assert all3["tp"] == 1


def test_fusion_truth_excluded():
    truth = {"S1": ["00101e2DP1*00201"]}
    pred = {"S1": []}
    df = evaluateHprc(truth, pred)
    all5 = df[(df["digits"] == 5) & (df["gene"] == "ALL")].iloc[0]
    assert all5["fn"] == 0 and all5["excluded"] == 1


def test_read_truth_format(tmp_path):
    fn = str(tmp_path / "truth.tsv")
    with open(fn, "w") as f:
        f.write("id\thaplos\talleles\tname\n")
        f.write("HG002\t1+2\tKIR2DL1*0030218_KIR2DL3*00101$\tHG002\n")
    truth = readHprcTruth(fn)
    assert truth == {"HG002": ["KIR2DL1*0030218", "KIR2DL3*00101$"]}


def test_real_hprc_truth_file():
    """The evaluator parses the reference's REAL HPRC truth table
    (47 samples, $/+ symbol grammar) and self-evaluation is ~perfect."""
    import os

    import pytest

    path = "/root/reference/research/groundtruth/hprc_summary_v1_2_e.tsv"
    if not os.path.exists(path):
        pytest.skip("reference truth file not present")
    from kir_graph_tpu.eval.hprc import evaluateHprc, readHprcTruth

    truth = readHprcTruth(path)
    assert len(truth) == 47
    assert "HG002" in truth and len(truth["HG002"]) == 25
    pred = {
        k: [a.replace("$", "").replace("+", "") for a in v]
        for k, v in truth.items()
    }
    table = evaluateHprc(truth, pred)
    overall = table[table["gene"] == "ALL"].set_index("digits")
    assert overall.loc[7, "f1"] == 1.0
    assert overall.loc[3, "f1"] > 0.99


def test_excluded_genes_levels():
    from kir_graph_tpu.eval.hprc import excludedGenesForSample

    alleles = [
        "KIR2DS4*00101e3DL1*03501",  # fusion: excludes 2DS4 AND 3DL1
        "KIR2DP1*00102#",            # novel CDS
        "KIR2DS2*005+",              # CDS-only
        "KIR2DL3*00101=",            # synonymous
        "KIR3DL2*00701$",            # non-CDS
        "KIR2DL1*0030218",           # clean
    ]
    assert excludedGenesForSample(alleles, 0) == {"KIR2DS4", "KIR3DL1"}
    assert excludedGenesForSample(alleles, 3) == {
        "KIR2DS4", "KIR3DL1", "KIR2DP1"
    }
    assert excludedGenesForSample(alleles, 5) == {
        "KIR2DS4", "KIR3DL1", "KIR2DP1", "KIR2DS2", "KIR2DL3"
    }
    assert excludedGenesForSample(alleles, 7) == {
        "KIR2DS4", "KIR3DL1", "KIR2DP1", "KIR2DS2", "KIR2DL3", "KIR3DL2"
    }


def test_remove_novel_on_real_truth():
    """Remove-novel grading on the reference's real 47-sample table:
    errors planted ONLY in '#'-carrying genes disappear at level >= 3."""
    import os

    path = "/root/reference/research/groundtruth/hprc_summary_v1_2_e.tsv"
    if not os.path.exists(path):
        pytest.skip("reference truth file not present")
    from kir_graph_tpu.eval.hprc import (
        evaluateHprcRemoveNovel,
        getGeneName,
        readHprcTruth,
    )

    truth = readHprcTruth(path)
    pred = {}
    for sid, alleles in truth.items():
        out = []
        for a in alleles:
            clean = a.replace("$", "").replace("+", "").replace("=", "")
            if "#" in a:
                # wrong 7-digit call on every novel-CDS gene
                out.append(getGeneName(a) + "*9990101")
            else:
                out.append(clean.replace("#", ""))
        pred[sid] = out
    table = evaluateHprcRemoveNovel(truth, pred, digits=(3,))
    lvl = table[table["gene"] == "ALL"].set_index("filter_level")
    assert lvl.loc[0, "fp"] > 0          # planted errors visible
    assert lvl.loc[3, "fp"] == 0         # novel-CDS genes removed
    assert lvl.loc[7, "fp"] == 0
    assert lvl.loc[3, "f1"] == 1.0
    # denominators shrink monotonically as the filter tightens
    assert (
        lvl.loc[0, "tp"] + lvl.loc[0, "fp"]
        > lvl.loc[3, "tp"]
        >= lvl.loc[5, "tp"]
        >= lvl.loc[7, "tp"]
    )


def test_ignore_novel_summary():
    from kir_graph_tpu.eval.hprc import compareCohortIgnoreNovel

    truth = {
        "S1": [
            "KIR2DL1*0030218",
            "KIR2DP1*00102#",
            "KIR3DL2*00701$",
        ]
    }
    pred = {
        "S1": [
            "KIR2DL1*0030218",
            "KIR2DP1*9990101",   # wrong on the novel-CDS gene
            "KIR3DL2*0070101",
        ]
    }
    # symbols ignored for matching: 3DL2 '$' truth still matches at 5
    full = compareCohortIgnoreNovel(truth, pred, novel_res=-1)
    assert full["total"] == 3 and full["match_gene"] == 3
    assert full["match7"] == 1  # only 2DL1 matches at 7 digits
    # novel_res=3 drops the '#' gene from the summary
    filt = compareCohortIgnoreNovel(truth, pred, novel_res=3)
    assert filt["total"] == 2 and filt["match_gene"] == 2
    assert filt["match5"] == 2
