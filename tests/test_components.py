"""WGS extraction, novel discovery, cohort generator, plots."""
import os

import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.msa.genemsa import saveAllMsa, writeFasta
from kir_graph_tpu.sim.cohort import (
    generateCohortFastq,
    sampleCohortAlleles,
    syntheticHaplotypeTable,
)
from kir_graph_tpu.sim.reads import simulatePairedReads, writeFastq as writeFq
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


def test_wgs_extraction(tmp_path, synth_genes, synth_index):
    from kir_graph_tpu.wgs.extract import KIR_REGIONS, buildWgsIndex, extractKirReads

    # fake genome: chr19 with the KIR-like gene planted inside the window,
    # plus a diploid region elsewhere
    rng = np.random.Generator(np.random.Philox(1))
    gname = synth_index.gene_names[0]
    gene_seq = alleleUngappedSeq(
        synth_genes[gname.split("*")[0]],
        synth_index.genes[gname].alleles[0],
    )
    chr19 = "".join("ACGT"[c] for c in rng.integers(0, 4, 5000))
    # build a tiny genome with custom coordinates: override region table
    import kir_graph_tpu.wgs.extract as wx

    genome = {"chrT": chr19 + gene_seq + chr19, "chrD": chr19 * 3}
    fa = str(tmp_path / "genome.fa")
    writeFasta(fa, list(genome.items()))
    old_kir, old_dip = wx.KIR_REGIONS, wx.REGIONS_OF_DIPLOID
    wx.KIR_REGIONS = {
        "hg19": [f"chrT:{len(chr19) + 1}-{len(chr19) + len(gene_seq)}"]
    }
    wx.REGIONS_OF_DIPLOID = {"hg19": {"VDR": f"chrD:1-{len(chr19) * 3}"}}
    try:
        wgs = wx.buildWgsIndex(fa, "hg19", diploid_gene="VDR")
        # reads: half from the KIR gene, half from the diploid region
        sim_kir = simulatePairedReads({"kir": gene_seq}, depth=4, seed=2)
        sim_dip = simulatePairedReads({"dip": genome["chrD"]}, depth=1, seed=3)
        r1 = str(tmp_path / "wgs.read.1.fq.gz")
        r2 = str(tmp_path / "wgs.read.2.fq.gz")
        writeFq(r1, sim_kir.names + sim_dip.names, sim_kir.r1 + sim_dip.r1)
        writeFq(r2, sim_kir.names + sim_dip.names, sim_kir.r2 + sim_dip.r2)
        o1, o2, stat = wx.extractKirReads(
            wgs, r1, r2, str(tmp_path / "out"), diploid_out=str(tmp_path / "dip")
        )
        from kir_graph_tpu.sim.reads import readFastq

        kept_names, _ = readFastq(o1)
        # kept reads are (mostly) the KIR ones
        assert len(kept_names) > 0.8 * len(sim_kir.r1)
        assert all("kir" in n for n in kept_names)
        assert os.path.exists(stat + ".json")
    finally:
        wx.KIR_REGIONS, wx.REGIONS_OF_DIPLOID = old_kir, old_dip


def test_cohort_generator(tmp_path, synth_genes, synth_index):
    haplo = syntheticHaplotypeTable(
        [n.split("*")[0] for n in synth_index.gene_names], seed=1
    )
    truths = sampleCohortAlleles(synth_index, haplo, n_samples=3, seed=5)
    assert len(truths) == 3
    df = generateCohortFastq(
        synth_genes, synth_index, truths, str(tmp_path / "cohort"), depth=2
    )
    assert os.path.exists(str(tmp_path / "cohort_summary.csv"))
    for t in truths:
        if t.alleles:
            assert os.path.exists(t.r1)


def test_novel_discovery(tmp_path, synth_genes, synth_index):
    """Spike a novel SNV into an allele; discovery should report it."""
    from kir_graph_tpu.align import GraphAligner, VariantAnnotator, encodeReads
    from kir_graph_tpu.novel.discover import discoverNovel
    from kir_graph_tpu.sim.cohort import mutateNovel
    from kir_graph_tpu.typing import writeReadsAndVariantsData
    from kir_graph_tpu.typing.facade import TypingWithPosNegAllele

    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    allele = g.alleles[0]
    seq = alleleUngappedSeq(synth_genes[gname.split("*")[0]], allele)
    rng = np.random.Generator(np.random.Philox(9))
    mutated, tags = mutateNovel(seq, 1, rng)

    sim = simulatePairedReads({allele: mutated}, depth=20, seed=4, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(synth_index)
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    reads_data, depth, pileup, _ = ann.annotate(res)

    variant_name = str(tmp_path / "s0.variant")
    writeReadsAndVariantsData(reads_data, variant_name + ".json")
    np.save(variant_name + ".pileup.npy", pileup)
    saveAllMsa(synth_genes, str(tmp_path / "msa"))
    pd.DataFrame([{"name": "s0", "alleles": allele}]).to_csv(
        str(tmp_path / "s0.tsv"), sep="\t", index=False
    )
    out = str(tmp_path / "novel")
    with open(str(tmp_path / "novel.log"), "w") as f:
        discoverNovel(
            variant_name,
            str(tmp_path / "msa"),
            str(tmp_path / "s0"),
            out,
            novel_descr=f,
            gene_names=synth_index.gene_names,
        )
    dfv = pd.read_csv(out + ".variant.tsv", sep="\t")
    applied = dfv[~dfv["skip"]]
    assert len(applied) >= 1  # the spiked SNV survived the filters
    called = pd.read_csv(out + ".tsv", sep="\t")
    assert "-" in called["alleles"][0]  # novel-suffixed allele name


def test_plot_outputs(tmp_path):
    from kir_graph_tpu.plot import histFigure, lineFigure, savePlot

    figs = [
        lineFigure("t", [("a", [0, 1, 2], [1.0, 2.0, 1.5])]),
        histFigure("h", np.random.default_rng(0).normal(size=200)),
    ]
    out = str(tmp_path / "report.html")
    savePlot(out, figs)
    content = open(out).read()
    assert "<svg" in content and "report" not in content[:0]
