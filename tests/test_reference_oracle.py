"""Differential tests against the reference's OWN code (VERDICT r3 #2).

The reference's typing/CN/EM stages are pure numpy and importable
offline (see kir_graph_tpu/eval/reference_oracle.py).  These tests feed
the SAME ``.variant.json`` and depth TSV that our pipeline produced to
both implementations and require IDENTICAL outputs:

* CN tables (CNgroup with the 3DL3 refit loop, and KDEcut)
* allele calls for the ``full``, ``exonfirst_1`` and ``em`` strategies
* EM per-allele abundance reports

This upgrades "proxy parity" (tests/test_parity.py) to "reference-code
parity" for stages D/E.
"""
import os

import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.cn.predict import loadCN, predictSamplesCN
from kir_graph_tpu.eval.reference_oracle import (
    REFERENCE_ROOT,
    importReference,
    referencePredictCN,
    referenceTyping,
    writeReferenceCompatJson,
)
from kir_graph_tpu.pipeline.run import SamplePipeline
from kir_graph_tpu.sim.reads import simulatePairedReads, writeFastq
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq
from kir_graph_tpu.typing.facade import selectKirTypingModel

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not present"
)


@pytest.fixture(scope="module")
def oracle_sample(tmp_path_factory, synth_genes, synth_index):
    """One simulated sample driven through OUR pipeline to the
    .variant.json + depth TSV artifacts, plus a reference-compat copy."""
    d = tmp_path_factory.mktemp("oracle")
    gnames = synth_index.gene_names
    g3dl3 = next(n for n in gnames if "3DL3" in n)
    others = [n for n in gnames if n != g3dl3]
    spec = {g3dl3: [3, 5], others[0]: [0, 6], others[1]: [7], others[2]: [2, 2]}

    copies: dict[str, int] = {}
    seqs = {}
    for gname, ai_list in spec.items():
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in ai_list:
            a = g.alleles[ai]
            copies[a] = copies.get(a, 0) + 1
            seqs.setdefault(a, alleleUngappedSeq(msa, a))
    sim = simulatePairedReads(
        seqs, depth=22, seed=909, error_rate=0.002,
        allele_copies=copies, sample_name="oracle0",
    )
    r1, r2 = str(d / "o.read.1.fq.gz"), str(d / "o.read.2.fq.gz")
    writeFastq(r1, sim.names, sim.r1)
    writeFastq(r2, sim.names, sim.r2)

    pipe = SamplePipeline(synth_index)
    processed = pipe.mapSample(str(d / "o"), r1, r2)
    pipe.flushWrites()
    depth_tsv = processed + ".no_multi.depth.tsv"
    ref_json = processed + ".refcompat.json"
    writeReferenceCompatJson(processed + ".json", ref_json)
    return {
        "dir": d,
        "processed": processed,
        "json": processed + ".json",
        "ref_json": ref_json,
        "depth_tsv": depth_tsv,
    }


@pytest.fixture(scope="module")
def oracle_cn(oracle_sample):
    """Our CN stage output (drives both typings with the same gene_cn)."""
    out = str(oracle_sample["dir"] / "ours.cn.tsv")
    predictSamplesCN(
        [oracle_sample["depth_tsv"]], [out], assume_3DL3_diploid=True
    )
    return out


def test_cn_oracle_cngroup(oracle_sample, oracle_cn):
    ref_out = str(oracle_sample["dir"] / "ref.cn.tsv")
    referencePredictCN(
        [oracle_sample["depth_tsv"]], [ref_out], assume_3DL3_diploid=True
    )
    ours = pd.read_csv(oracle_cn, sep="\t")
    ref = pd.read_csv(ref_out, sep="\t")
    assert list(ours["gene"]) == list(ref["gene"])
    assert list(ours["cn"]) == list(ref["cn"]), (ours, ref)
    np.testing.assert_allclose(ours["depth"], ref["depth"], rtol=1e-12)
    assert any(cn > 0 for cn in ours["cn"]), "degenerate CN table"


def test_cn_oracle_kde(oracle_sample):
    ref_out = str(oracle_sample["dir"] / "ref.kde.cn.tsv")
    our_out = str(oracle_sample["dir"] / "ours.kde.cn.tsv")
    referencePredictCN(
        [oracle_sample["depth_tsv"]], [ref_out], cluster_method="kde"
    )
    predictSamplesCN(
        [oracle_sample["depth_tsv"]], [our_out], cluster_method="kde"
    )
    ours = pd.read_csv(our_out, sep="\t")
    ref = pd.read_csv(ref_out, sep="\t")
    assert list(ours["gene"]) == list(ref["gene"])
    assert list(ours["cn"]) == list(ref["cn"]), (ours, ref)


@pytest.mark.parametrize("method", ["full", "exonfirst_1", "em"])
def test_typing_oracle(oracle_sample, oracle_cn, method):
    gene_cn = loadCN(oracle_cn)
    assert sum(gene_cn.values()) >= 5

    ref_alleles, ref_warn, _ = referenceTyping(
        oracle_sample["ref_json"], gene_cn, method=method
    )
    if method == "em":
        ours = selectKirTypingModel("em", oracle_sample["json"])
    else:
        ours = selectKirTypingModel(
            method, oracle_sample["json"], top_n=600, variant_correction=True
        )
    our_alleles, our_warn = ours.typing(gene_cn)

    assert sorted(our_alleles) == sorted(ref_alleles)
    assert sorted(our_warn) == sorted(ref_warn)
    assert len(our_alleles) == sum(gene_cn.values())


def test_typing_oracle_possible_sets(oracle_sample, oracle_cn):
    """The exported possible-set table (rank/value/alleles) matches too."""
    gene_cn = loadCN(oracle_cn)
    _, _, ref_model = referenceTyping(
        oracle_sample["ref_json"], gene_cn, method="full"
    )
    ours = selectKirTypingModel(
        "full", oracle_sample["json"], top_n=600, variant_correction=True
    )
    ours.typing(gene_cn)
    ref_rows = ref_model.getAllPossibleTyping()
    our_rows = ours.getAllPossibleTyping()
    assert len(ref_rows) == len(our_rows)
    for r, o in zip(ref_rows, our_rows):
        assert r["gene"] == o["gene"] and r["rank"] == o["rank"]
        # our likelihood accumulates in float32 on the MXU vs the
        # reference's float64 numpy: values agree to ~1e-5 relative;
        # the SELECTED allele sets must agree exactly (below)
        np.testing.assert_allclose(r["value"], o["value"], rtol=1e-4, atol=1e-3)
        r_alleles = sorted(v for k, v in r.items() if k.isdigit())
        o_alleles = sorted(v for k, v in o.items() if k.isdigit())
        assert r_alleles == o_alleles


def test_em_report_oracle(oracle_sample):
    """Per-allele EM abundances agree gene by gene (typing_em.py oracle)."""
    gk = importReference()
    ref_data = gk.hisat2.loadReadsAndVariantsData(oracle_sample["ref_json"])
    ref_data = gk.hisat2.removeMultipleMapped(ref_data)
    ref_genes = gk.typing_em.preprocessHisatReads(ref_data)

    from kir_graph_tpu.typing.em import hisat2TypingPerGene, preprocessHisatReads
    from kir_graph_tpu.typing.pairread import (
        loadReadsAndVariantsData,
        removeMultipleMapped,
    )

    our_data = removeMultipleMapped(loadReadsAndVariantsData(oracle_sample["json"]))
    our_genes = preprocessHisatReads(our_data)
    assert set(our_genes) == set(ref_genes)
    for gene in sorted(ref_genes):
        ref_rep = {r.allele: r.prob for r in gk.typing_em.hisat2TypingPerGene(ref_genes[gene])}
        our_rep = {r.allele: r.prob for r in hisat2TypingPerGene(our_genes[gene])}
        assert set(ref_rep) == set(our_rep), gene
        for a in ref_rep:
            # abundances in [0,1]; our SQUAREM iterates in float32
            np.testing.assert_allclose(our_rep[a], ref_rep[a], atol=1e-4)
