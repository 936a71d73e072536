import pandas as pd

from kir_graph_tpu.eval import (
    MatchType,
    allele2CN,
    calcSummaryByResolution,
    compareCN,
    compareCNCohort,
    compareCohort,
    compareSample,
)


def test_compare_sample_lattice():
    answer = ["KIR2DL1*0010101", "KIR2DL1*0020101", "KIR3DL3*0030101"]
    predict = ["KIR2DL1*0010101", "KIR2DL1*0020203", "KIR3DL3*0040101"]
    res = compareSample(answer, predict)
    types = sorted(r.match_type.name for r in res)
    assert types == ["MATCH3", "MATCH7", "MATCHGENE"]


def test_compare_sample_fn_fp():
    res = compareSample(["KIR2DL1*0010101"], [])
    assert [r.match_type for r in res] == [MatchType.FN]
    res = compareSample([], ["KIR2DL1*0010101"])
    assert [r.match_type for r in res] == [MatchType.FP]


def test_exon_suffix_stripped():
    res = compareSample(["KIR2DS2*00104"], ["KIR2DS2*00104e"])
    assert res[0].match_type == MatchType.MATCH7


def test_match5_via_truncated():
    res = compareSample(["KIR2DL1*0010101"], ["KIR2DL1*00101"])
    assert res[0].match_type == MatchType.MATCH5


def test_summary_by_resolution():
    answer = {"00": ["KIR2DL1*0010101", "KIR2DL1*0020101"]}
    predict = {"00": ["KIR2DL1*0010101", "KIR2DL1*0020102"]}
    res = compareCohort(answer, predict)
    summary = calcSummaryByResolution(r for rs in res.values() for r in rs)
    assert summary["total"] == 2
    assert summary["match7"] == 1
    assert summary["match5"] == 2


def test_cn_compare_with_merged_genes():
    ans = {"KIR2DL1": 2, "KIR2DS1": 1, "KIR3DL3": 2}
    pred = {"KIR2DL1S1": 3, "KIR3DL3": 2}
    comps = compareCN(ans, pred)
    assert all(c["diff"] == 0 for c in comps)

    pred_bad = {"KIR2DL1S1": 2, "KIR3DL3": 2}
    comps = compareCN(ans, pred_bad)
    assert any(c["diff_abs"] == 1 for c in comps)


def test_cn_cohort_accuracy():
    ans = {"00": {"KIR3DL3": 2}, "01": {"KIR3DL3": 2}}
    pred = {"00": {"KIR3DL3": 2}, "01": {"KIR3DL3": 1}}
    df = compareCNCohort(ans, pred)
    assert df["diff_abs"].sum() == 1


def test_allele2cn():
    assert allele2CN(["KIR2DL1*001", "KIR2DL1*002", "KIR3DL3*001"]) == {
        "KIR2DL1": 2,
        "KIR3DL3": 1,
    }


def test_possible_set_stats():
    from kir_graph_tpu.eval import evalPossibleSets, summarizePossibleSets

    rows = [
        {"gene": "KIR2DL1*BACKBONE", "rank": 0, "value": -10.0,
         "1": "KIR2DL1*0010101", "2": "KIR2DL1*0020101"},
        {"gene": "KIR2DL1*BACKBONE", "rank": 1, "value": -11.0,
         "1": "KIR2DL1*0010101", "2": "KIR2DL1*0030101"},
        {"gene": "KIR3DL3*BACKBONE", "rank": 0, "value": -5.0,
         "1": "KIR3DL3*0020101", "2": "KIR3DL3*0020101"},
    ]
    truth = ["KIR2DL1*0030101", "KIR2DL1*0010101",
             "KIR3DL3*0010101", "KIR3DL3*0010101"]
    stats = evalPossibleSets(rows, truth, sample_id="s0")
    by_gene = {s.gene.split("*")[0]: s for s in stats}
    # truth set appears at rank 1 for 2DL1 (order-free), nowhere for 3DL3
    assert by_gene["KIR2DL1"].truth_rank == 1
    assert not by_gene["KIR2DL1"].top_correct
    assert by_gene["KIR3DL3"].truth_rank == -1

    df = summarizePossibleSets(stats)
    row = df[df["gene"] == "KIR2DL1"].iloc[0]
    assert row["truth_in_possible"] == 1.0 and row["truth_at_top"] == 0.0
    row = df[df["gene"] == "KIR3DL3"].iloc[0]
    assert row["truth_in_possible"] == 0.0


def test_version_drift_db(synth_genes):
    from kir_graph_tpu.sim.cohort import versionDriftDB

    reduced, removed = versionDriftDB(synth_genes, n_remove_per_gene=1, seed=5)
    assert removed
    for gene, msa in reduced.items():
        names = msa.get_sequence_names()
        assert any("BACKBONE" in n for n in names)
        assert len([n for n in names if "BACKBONE" not in n]) >= 2
    for victim in removed:
        gene = victim.split("*")[0]
        assert victim not in reduced[gene].get_sequence_names()
        assert victim in synth_genes[gene].get_sequence_names()


def test_lcs_length_vs_bruteforce():
    import numpy as np

    from kir_graph_tpu.eval.compare import lcsLength

    def brute(a, b):
        dp = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                dp[i, j] = max(
                    dp[i - 1, j], dp[i, j - 1],
                    dp[i - 1, j - 1] + (a[i - 1] == b[j - 1]),
                )
        return int(dp[-1, -1])

    rng = np.random.Generator(np.random.Philox(9))
    for n, m in ((0, 5), (7, 0), (1, 1), (30, 25), (64, 64), (65, 130)):
        a = "".join("ACGT"[c] for c in rng.integers(0, 4, n))
        b = "".join("ACGT"[c] for c in rng.integers(0, 4, m))
        assert lcsLength(a, b) == brute(a, b), (n, m)
    assert lcsLength("ACGT", "ACGT") == 4
    assert lcsLength("AAAA", "CCCC") == 0


def test_add_base_matchness():
    from kir_graph_tpu.eval.compare import (
        MatchType,
        addBaseMatchness,
        compareCohort,
    )

    ans = {"s0": ["KIR2DL1*0010101", "KIR2DL1*0020101"]}
    pred = {"s0": ["KIR2DL1*0010101", "KIR2DL1*0020102"]}
    seqs = {
        "KIR2DL1*0010101": "ACGTACGTACGT",
        "KIR2DL1*0020101": "ACGTAAAAACGT",
        "KIR2DL1*0020102": "ACGTAAACACGT",  # one C<->A change
    }
    results = compareCohort(ans, pred)
    addBaseMatchness(results, seqs)
    by_ans = {r.answer_allele_full: r for r in results["s0"]}
    exact = by_ans["KIR2DL1*0010101"]
    assert exact.match_type == MatchType.MATCH7
    assert exact.base_diff == 0
    near = by_ans["KIR2DL1*0020101"]
    assert near.match_type == MatchType.MATCH5
    assert near.base_diff == 1
    assert near.answer_allele_length == 12


def test_summary_by_gene_and_report(tmp_path):
    from kir_graph_tpu.eval.compare import calcSummaryByGene, saveCompareReport

    answer = {
        "00": ["KIR2DL1*0010101", "KIR3DL3*0030101"],
        "01": ["KIR2DL1*0020101"],
    }
    predict = {
        "00": ["KIR2DL1*0010101", "KIR3DL3*0040101"],
        "01": ["KIR2DL1*0020101", "KIR2DS2*00104"],
    }
    results = compareCohort(answer, predict)
    by_gene = calcSummaryByGene(r for rs in results.values() for r in rs)
    assert by_gene["KIR2DL1"]["match7"] == 2
    assert by_gene["KIR3DL3"]["match_gene"] == 1
    assert by_gene["KIR3DL3"]["match7"] == 0
    assert by_gene["KIR2DS2"]["FP"] == 1

    prefix = str(tmp_path / "cmp")
    saveCompareReport(results, prefix)
    sample = pd.read_csv(prefix + ".sample.csv")
    assert set(sample["match"]) >= {"MATCH7", "MATCHGENE", "FP"}
    assert len(sample) == 4
    gene = pd.read_csv(prefix + ".gene.csv")
    row = gene[gene["gene"] == "KIR2DL1"].iloc[0]
    assert row["acc_7digit"] == 1.0
    html = open(prefix + ".gene.html").read()
    assert "per-gene accuracy (7-digit)" in html and "<svg" in html
