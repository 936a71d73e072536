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


def test_novel_discovery_cn2_read_group(tmp_path, synth_genes, synth_index):
    """CN=2: the group-restricted pileup confirms a novel SNV private to
    one of two called alleles, where the whole-gene pileup (the CN=1-only
    fallback) would reject it (reference novel_discover.py:237-264)."""
    from kir_graph_tpu.align import GraphAligner, VariantAnnotator, encodeReads
    from kir_graph_tpu.novel.discover import discoverNovel

    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    allele_a, allele_b = g.alleles[0], g.alleles[1]
    gene_base = gname.split("*")[0]
    msa = synth_genes[gene_base]
    gap_a, gap_b = msa.get(allele_a), msa.get(allele_b)

    # pick a column where A and B agree (so B's reads pile up REF there),
    # no catalogued SNP offers the base we mutate to, and an A-vs-B
    # discriminating column sits within read range (else every read
    # covering the novel site ties between A and B and the read group
    # assigned solely to A never sees it)
    cat = {(v.pos, v.val) for v in g.variants if v.typ == "single"}
    discr = [
        c for c in range(len(gap_a))
        if gap_a[c] != gap_b[c] and "-" not in (gap_a[c], gap_b[c])
    ]
    col, alt = -1, ""
    for c in range(300, len(gap_a) - 300):
        if gap_a[c] == "-" or gap_a[c] != gap_b[c]:
            continue
        if not any(0 < abs(c - d) <= 60 for d in discr):
            continue
        alts = [b for b in "ACGT" if b != gap_a[c] and (c, b) not in cat]
        if alts:
            col, alt = c, alts[0]
            break
    assert col > 0

    ung_pos = sum(1 for ch in gap_a[:col] if ch != "-")
    seq_a = alleleUngappedSeq(synth_genes[gene_base], allele_a)
    seq_b = alleleUngappedSeq(synth_genes[gene_base], allele_b)
    assert seq_a[ung_pos] == gap_a[col]
    mut_a = seq_a[:ung_pos] + alt + seq_a[ung_pos + 1 :]

    # B at double depth: the whole-gene pileup at `col` is REF-majority
    sim_a = simulatePairedReads({allele_a: mut_a}, depth=30, seed=11, error_rate=0.0)
    sim_b = simulatePairedReads({allele_b: seq_b}, depth=60, seed=12, error_rate=0.0)
    c1, l1 = encodeReads(sim_a.r1 + sim_b.r1)
    c2, l2 = encodeReads(sim_a.r2 + sim_b.r2)
    aligner = GraphAligner(synth_index)
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    reads_data, depth, pileup, passed = ann.annotate(res)

    from kir_graph_tpu.typing import writeReadsAndVariantsData

    variant_name = str(tmp_path / "s2.variant")
    writeReadsAndVariantsData(reads_data, variant_name + ".json")
    np.save(variant_name + ".pileup.npy", pileup)
    rows = np.nonzero(passed)[0]
    np.savez_compressed(
        variant_name + ".placements.npz",
        pair_rows=rows.astype(np.int32),
        gene=res.gene[rows].astype(np.int32),
        cols_l=res.cols_l[rows].astype(np.int32),
        cols_r=res.cols_r[rows].astype(np.int32),
        bases_l=res.bases_l[rows].astype(np.int8),
        bases_r=res.bases_r[rows].astype(np.int8),
    )
    saveAllMsa(synth_genes, str(tmp_path / "msa"))
    pd.DataFrame([{"name": "s2", "alleles": f"{allele_a}_{allele_b}"}]).to_csv(
        str(tmp_path / "s2.tsv"), sep="\t", index=False
    )

    # group-restricted pileup (placements auto-detected): SNV confirmed
    out = str(tmp_path / "novel2")
    with open(str(tmp_path / "novel2.log"), "w") as f:
        discoverNovel(
            variant_name, str(tmp_path / "msa"), str(tmp_path / "s2"), out,
            novel_descr=f, gene_names=synth_index.gene_names,
        )
    dfv = pd.read_csv(out + ".variant.tsv", sep="\t")
    hit = dfv[(dfv["pos"] == col) & (dfv["allele"] == allele_a)]
    assert len(hit) == 1 and not hit["skip"].iloc[0]
    called = pd.read_csv(out + ".tsv", sep="\t")["alleles"][0].split("_")
    assert f"{allele_a}-{col}{alt}" in called and allele_b in called

    # whole-gene fallback (no placements): B's REF reads dilute the site
    os.remove(variant_name + ".placements.npz")
    out3 = str(tmp_path / "novel3")
    with open(str(tmp_path / "novel3.log"), "w") as f:
        discoverNovel(
            variant_name, str(tmp_path / "msa"), str(tmp_path / "s2"), out3,
            novel_descr=f, gene_names=synth_index.gene_names,
        )
    dfv3 = pd.read_csv(out3 + ".variant.tsv", sep="\t")
    hit3 = dfv3[(dfv3["pos"] == col) & (dfv3["allele"] == allele_a)]
    assert len(hit3) == 1 and hit3["skip"].iloc[0]
    assert hit3["skip_reason"].iloc[0] == "ALT depths < REF depths"
