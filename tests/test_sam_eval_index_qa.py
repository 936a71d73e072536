"""SAM-truth mapping eval + index QA (VERDICT round-1 item 9).

End-to-end: simulate reads with truth-carrying names, align, export SAM,
re-parse the SAM with the independent evaluator and check the per-gene
stat/precision tables (reference kg_eval_mapping.py calc layer); plus the
kg_eval_index-style structural QA of the built index.
"""
import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, encodeReads
from kir_graph_tpu.align.sam_export import writeSam
from kir_graph_tpu.eval.index_qa import runIndexQA
from kir_graph_tpu.eval.sam_mapping import (
    evalSamFile,
    readSamRecords,
    truthTotalsFromNames,
)
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def sam_world(synth_genes, synth_index, tmp_path_factory):
    seqs = {}
    for gene_key in list(synth_genes)[:3]:
        g = synth_index.genes[f"{gene_key}*BACKBONE"]
        allele = g.alleles[0]
        seqs[allele] = alleleUngappedSeq(synth_genes[gene_key], allele)
    sim = simulatePairedReads(seqs, depth=8, seed=7, error_rate=0.002)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    result = GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)
    sam = tmp_path_factory.mktemp("sam") / "sample.sam"
    writeSam(str(sam), result, synth_index, names=sim.names)
    return sim, result, str(sam)


def test_sam_roundtrip_parse(sam_world):
    sim, result, sam = sam_world
    recs = readSamRecords(sam)
    # one entry per mapped pair, two records each
    n_mapped = int((result.gene >= 0).sum())
    assert len(recs) == n_mapped
    assert all(len(v) == 2 for v in recs.values())


def test_sam_stat_and_precision(sam_world):
    sim, result, sam = sam_world
    totals = truthTotalsFromNames(sim.names)
    out = evalSamFile(sam, totals)
    stat = {r["gene"]: r for r in out["stat"]}
    assert set(stat) == set(totals)
    for gene, row in stat.items():
        assert row["pair_perc"] > 0.8, (gene, row)
        assert row["miss_perc"] < 0.2, (gene, row)
    prec = [r for r in out["precision"] if r["type"] == "primary-only"]
    for row in prec:
        # clean single-allele-per-gene sample: primary placements should
        # land on the right gene almost always
        assert row["precision"] > 0.95, row
        assert row["recall"] > 0.8, row


def test_precision_detects_wrong_gene(sam_world, tmp_path):
    """Corrupt the SAM's RNAMEs and the precision must collapse."""
    sim, result, sam = sam_world
    bad = tmp_path / "bad.sam"
    with open(sam) as f, open(bad, "w") as g:
        for line in f:
            if line.startswith("@"):
                g.write(line)
                continue
            fields = line.split("\t")
            fields[2] = "KIRX*BACKBONE"
            g.write("\t".join(fields))
    totals = truthTotalsFromNames(sim.names)
    out = evalSamFile(str(bad), totals)
    for row in out["precision"]:
        assert row["correct"] == 0


def test_index_qa_clean(synth_genes, synth_index):
    report = runIndexQA(synth_index, synth_genes)
    assert report["ok"], report


def test_index_qa_detects_corruption(synth_genes, synth_index):
    import copy

    index = copy.deepcopy(synth_index)
    g = index.genes[index.gene_names[0]]
    if len(g.var_pos):
        g.var_pos[0] = g.length + 50  # out of bounds
    report = runIndexQA(index, synth_genes)
    assert not report["ok"]
    assert any("out of backbone" in p for p in report["catalog"])


def test_from_to_and_roc():
    """Gene-migration rows, specificity aggregation and ROC points
    (reference kg_eval_mapping.py:653-787, 375-383 calc layers)."""
    from kir_graph_tpu.eval.sam_mapping import (
        calcFromTo,
        fromToStat,
        genePrecision,
        isGeneCorrect,
        rocPoints,
    )
    from kir_graph_tpu.typing.pairread import PairRead

    # merged-backbone comparisons
    assert isGeneCorrect("KIR2DL5", "KIR2DL5A")
    assert isGeneCorrect("KIR2DL1S1", "KIR2DS1")
    assert not isGeneCorrect("KIR2DL1S1", "KIR2DL2")
    assert isGeneCorrect("KIR3DL3", "KIR3DL3")

    names = ["s:KIR2DL1*001:0", "s:KIR2DS1*002:1", "s:KIR3DL3*001:2"]
    reads = [
        PairRead(backbone="KIR2DL1S1*BACKBONE", multiple=1, pair_index=0),
        PairRead(backbone="KIR2DL1S1*BACKBONE", multiple=2, pair_index=1),
        PairRead(backbone="KIR2DL2*BACKBONE", multiple=1, pair_index=2),
    ]
    rows = calcFromTo(reads, names)
    assert [r["correct"] for r in rows] == [True, True, False]
    assert rows[1]["is_multi"]

    stat = fromToStat(rows, allow_multi=True, method="tpu")
    by_gene = {r["to"]: r["acc"] for r in stat}
    assert by_gene["KIR2DL1S1"] == 1.0 and by_gene["KIR2DL2"] == 0.0
    # multi-excluded: the 2DS1 read drops out
    stat_uniq = fromToStat(rows, allow_multi=False)
    assert {r["to"]: r["acc"] for r in stat_uniq} == {
        "KIR2DL1S1": 1.0, "KIR2DL2": 0.0}

    prec = [
        {"gene": "A", "type": "all", "precision": 0.9, "recall": 0.8},
        {"gene": "B", "type": "all", "precision": 0.7, "recall": 0.6},
    ]
    pts = rocPoints(prec, method="tpu")
    overall = [p for p in pts if p["gene"] == "*"]
    assert len(overall) == 1
    assert overall[0]["FDR"] == pytest.approx(1 - 0.8)
    assert overall[0]["recall"] == pytest.approx(0.7)
