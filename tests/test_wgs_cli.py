"""CLI --wgs-genome stage + mapping-accuracy eval."""
import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.align import GraphAligner, encodeReads
from kir_graph_tpu.eval.compare_mapping import mappingAccuracy
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


def test_mapping_accuracy(synth_genes, synth_index):
    gname = synth_index.gene_names[1]
    g = synth_index.genes[gname]
    allele = g.alleles[0]
    seqs = {allele: alleleUngappedSeq(synth_genes[gname.split("*")[0]], allele)}
    sim = simulatePairedReads(seqs, depth=4, seed=11, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    res = GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)
    stats = mappingAccuracy(res, sim, synth_index, synth_genes)
    assert stats["mapped"] > 0.95
    assert stats["gene_acc"] > 0.95
    assert stats["pos_acc"] > 0.9


def test_cli_wgs_stage(tmp_path, synth_genes, synth_index):
    """--wgs-genome: extraction feeds the normal pipeline."""
    import kir_graph_tpu.wgs.extract as wx
    from kir_graph_tpu.index.build import saveIndex
    from kir_graph_tpu.msa.genemsa import writeFasta
    from kir_graph_tpu.pipeline.main import createParser, main
    from kir_graph_tpu.sim.reads import writeFastq

    saveIndex(synth_index, str(tmp_path / "index"))
    g3dl3 = next(n for n in synth_index.gene_names if "3DL3" in n)
    g = synth_index.genes[g3dl3]
    msa = synth_genes[g3dl3.split("*")[0]]
    allele = g.alleles[3]
    gene_seq = alleleUngappedSeq(msa, allele)

    rng = np.random.Generator(np.random.Philox(2))
    flank = "".join("ACGT"[c] for c in rng.integers(0, 4, 3000))
    genome = {"chrT": flank + gene_seq + flank}
    fa = str(tmp_path / "genome.fa")
    writeFasta(fa, list(genome.items()))

    old = wx.KIR_REGIONS
    wx.KIR_REGIONS = {
        "hg19": [f"chrT:{len(flank) + 1}-{len(flank) + len(gene_seq)}"]
    }
    try:
        sim = simulatePairedReads({allele: gene_seq}, depth=25, seed=3)
        r1 = str(tmp_path / "s.read.1.fq.gz")
        r2 = str(tmp_path / "s.read.2.fq.gz")
        writeFastq(r1, sim.names, sim.r1)
        writeFastq(r2, sim.names, sim.r2)
        args = createParser().parse_args(
            [
                "--r1", r1, "--r2", r2,
                "--index-prefix", str(tmp_path / "index"),
                "--wgs-genome", fa,
                "--output-cohort-name", str(tmp_path / "cohort"),
                "--cn-3dl3-not-diploid",  # single CN2 gene: no anchor refit
            ]
        )
        main(args)
        cn = pd.read_csv(str(tmp_path / "cohort.cn.tsv"), sep="\t", index_col=0)
        assert cn.loc[g3dl3].iloc[0] == 2
        al = pd.read_csv(str(tmp_path / "cohort.allele.tsv"), sep="\t")
        assert allele in str(al.iloc[0]["alleles"])
    finally:
        wx.KIR_REGIONS = old


def test_wgs_extraction_qa(tmp_path, synth_genes, synth_index):
    """kg_eval_wgs_mapping-style extraction QA: KIR recall, background
    leak, migration matrix on a synthetic WGS sample."""
    import kir_graph_tpu.wgs.extract as wx
    from kir_graph_tpu.eval.wgs_mapping import evaluateExtraction, originOf
    from kir_graph_tpu.msa.genemsa import writeFasta
    from kir_graph_tpu.sim.reads import readFastq, writeFastq

    rng = np.random.Generator(np.random.Philox(8))
    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    msa = synth_genes[gname.split("*")[0]]
    gene_seq = alleleUngappedSeq(msa, g.alleles[0])
    bg_seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 8000))
    flank = "".join("ACGT"[c] for c in rng.integers(0, 4, 1500))
    genome = {"chrT": flank + gene_seq + flank + bg_seq}
    fa = str(tmp_path / "g.fa")
    writeFasta(fa, list(genome.items()))

    old = wx.KIR_REGIONS
    wx.KIR_REGIONS = {
        "hg19": [f"chrT:{len(flank) + 1}-{len(flank) + len(gene_seq)}"]
    }
    try:
        sim = simulatePairedReads(
            {g.alleles[0]: gene_seq, "BG*1": bg_seq}, depth=10, seed=4
        )
        r1 = str(tmp_path / "w.read.1.fq.gz")
        r2 = str(tmp_path / "w.read.2.fq.gz")
        writeFastq(r1, sim.names, sim.r1)
        writeFastq(r2, sim.names, sim.r2)
        wgs = wx.buildWgsIndex(fa, "hg19")
        k1, k2, _ = wx.extractKirReads(wgs, r1, r2, str(tmp_path / "x"))
        kept_names, _ = readFastq(k1)
        kept_set = set(kept_names)
        kept_mask = np.array([n in kept_set for n in sim.names])
        # graph-gene placements for the kept reads (migration matrix)
        ksel = [i for i, n in enumerate(sim.names) if n in kept_set]
        c1, l1 = encodeReads([sim.r1[i] for i in ksel])
        c2, l2 = encodeReads([sim.r2[i] for i in ksel])
        res = GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)
        mapped_gene = [
            synth_index.gene_names[gi] if gi >= 0 else "unmapped"
            for gi in res.gene
        ]
        qa = evaluateExtraction(
            sim.names, kept_mask, {gname.split("*")[0]}, mapped_gene
        )
    finally:
        wx.KIR_REGIONS = old

    assert originOf(sim.names[0]) in (gname.split("*")[0], "BG")
    kir_row = qa.per_origin[qa.per_origin["is_kir"]].iloc[0]
    assert kir_row["kept_frac"] > 0.9
    bg_row = qa.per_origin[~qa.per_origin["is_kir"]].iloc[0]
    assert bg_row["kept_frac"] < 0.05
    # kept KIR reads land on the right graph gene
    assert qa.migration.loc[gname.split("*")[0], gname] > 0
