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


# ----------------------------------------------------------------------
# genome plumbing (reference wgs.py:33-55 + main.py:72-90 surface)
# ----------------------------------------------------------------------
def test_build_genome_index_resolves_local_file(tmp_path, monkeypatch):
    import kir_graph_tpu.wgs.extract as wx
    import kir_graph_tpu.wgs.genome as wg
    from kir_graph_tpu.msa.genemsa import writeFasta

    monkeypatch.setattr(
        wx, "KIR_REGIONS", {"hg19": ["chrT:1-40"], "hg38": []}
    )
    fa = tmp_path / "hs37d5.fa.gz"
    import gzip

    with gzip.open(fa, "wt") as f:
        f.write(">chrT here be dragons\nACGTACGTAC\nACGT\n")
    got = wg.buildGenomeIndex(str(tmp_path), "hg19")
    assert got == str(fa)


def test_build_genome_index_accepts_unpacked_copy(tmp_path, monkeypatch):
    import kir_graph_tpu.wgs.extract as wx
    import kir_graph_tpu.wgs.genome as wg

    monkeypatch.setattr(wx, "KIR_REGIONS", {"hg19": ["chrT:1-8"]})
    with open(tmp_path / "hs37d5.fa", "w") as f:
        f.write(">chrT\nACGTACGT\n")
    assert wg.buildGenomeIndex(str(tmp_path), "hg19").endswith("hs37d5.fa")


def test_build_genome_index_offline_raises_with_url(tmp_path, monkeypatch):
    import kir_graph_tpu.wgs.genome as wg

    monkeypatch.setattr(wg, "toolAvailable", lambda b: False)
    with pytest.raises(FileNotFoundError, match="ftp.ncbi.nlm.nih.gov"):
        wg.buildGenomeIndex(str(tmp_path), "hg38")
    with pytest.raises(ValueError, match="Unsupported"):
        wg.buildGenomeIndex(str(tmp_path), "t2t")


def test_validate_genome_reports_missing_contigs(tmp_path):
    import kir_graph_tpu.wgs.genome as wg

    fa = tmp_path / "g.fa"
    with open(fa, "w") as f:
        f.write(">19\nACGT\n>chrX\nACGT\n")
    # hg19 KIR window is on 19 + GL000209.1; only 19 is present
    missing = wg.validateGenome(str(fa), "hg19")
    assert missing == ["GL000209.1"]
    missing = wg.validateGenome(str(fa), "hg19", diploid_gene="VDR")
    assert missing == ["12", "GL000209.1"]
    with pytest.raises(ValueError, match="no FASTA"):
        empty = tmp_path / "e.fa"
        empty.write_text("")
        wg.validateGenome(str(empty), "hg19")


def test_cli_wgs_index_folder_flag(tmp_path):
    from kir_graph_tpu.pipeline.main import createParser

    args = createParser().parse_args(
        ["--r1", "a", "--r2", "b", "--index-prefix", "i",
         "--wgs-index-folder", str(tmp_path), "--ref-genome", "hg38"]
    )
    assert args.wgs_index_folder == str(tmp_path)
    assert args.ref_genome == "hg38"


def test_index_folder_and_index_wgs_aliases(tmp_path, synth_index, monkeypatch):
    """Reference-surface aliases (main.py:335-344): --index-folder
    resolves the KIR index (and the genome, when present); --index-wgs
    is --wgs-genome."""
    import gzip

    import kir_graph_tpu.wgs.extract as wx
    from kir_graph_tpu.index.build import saveIndex
    from kir_graph_tpu.pipeline.main import createParser, main

    folder = tmp_path / "index"
    folder.mkdir()
    saveIndex(synth_index, str(folder / "kir"))

    # bare KIR-index folder: index resolves, no genome -> no extraction
    args = createParser().parse_args(
        ["--r1", "a", "--r2", "b", "--index-folder", str(folder),
         "--index-wgs", "/some/genome.fa"]
    )
    with pytest.raises(FileNotFoundError, match="a"):
        main(args)  # fails at the FASTQ, i.e. alias resolution ran
    assert args.index_prefix == str(folder / "kir")
    assert args.wgs_genome == "/some/genome.fa"
    assert not args.wgs_index_folder

    # genome present in the folder -> doubles as --wgs-index-folder
    monkeypatch.setattr(wx, "KIR_REGIONS", {"hg19": ["chrT:1-8"]})
    with gzip.open(folder / "hs37d5.fa.gz", "wt") as f:
        f.write(">chrT\nACGTACGT\n")
    args = createParser().parse_args(
        ["--r1", "a", "--r2", "b", "--index-folder", str(folder)]
    )
    with pytest.raises(FileNotFoundError, match="a"):
        main(args)
    assert args.wgs_index_folder == str(folder)
