"""Real-WGS cohort orchestrator (reference research/kg_real.py) e2e:
WGS-shaped FASTQs -> extraction -> graph pipeline -> cohort tables ->
truth evaluation, on a synthetic genome."""
import numpy as np
import pandas as pd
import pytest

import kir_graph_tpu.wgs.extract as wx
from kir_graph_tpu.index.build import saveIndex
from kir_graph_tpu.msa.genemsa import writeFasta
from kir_graph_tpu.pipeline.real import createParser, main
from kir_graph_tpu.sim.reads import simulatePairedReads, writeFastq
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def real_cohort(tmp_path_factory, synth_genes, synth_index):
    d = tmp_path_factory.mktemp("real")
    saveIndex(synth_index, str(d / "index"))

    g3dl3 = next(n for n in synth_index.gene_names if "3DL3" in n)
    others = [n for n in synth_index.gene_names if n != g3dl3]
    rng = np.random.Generator(np.random.Philox(5))

    # synthetic "genome": flank + all gene backbones + flank + diploid region
    flank = "".join("ACGT"[c] for c in rng.integers(0, 4, 2000))
    dip_seq = "".join("ACGT"[c] for c in rng.integers(0, 4, 6000))
    kir_seqs = []
    for gname in synth_index.gene_names:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        kir_seqs.append(alleleUngappedSeq(msa, g.alleles[0]))
    kir_cat = flank.join(kir_seqs)
    genome = {"chrT": flank + kir_cat + flank + dip_seq + flank}
    kir_lo, kir_hi = len(flank) + 1, len(flank) + len(kir_cat)
    dip_lo = 2 * len(flank) + len(kir_cat) + 1
    dip_hi = dip_lo + len(dip_seq) - 1
    fa = str(d / "genome.fa")
    writeFasta(fa, list(genome.items()))

    # two samples with CN variation; diploid-region reads at 2-copy depth
    specs = [
        {g3dl3: [3, 3], others[0]: [0, 5], others[1]: [7]},
        {g3dl3: [1, 6], others[0]: [5], others[1]: [2, 9]},
    ]
    rows, truth = [], []
    for s, spec in enumerate(specs):
        copies: dict[str, int] = {}
        seqs = {"DIPLOID*SEQ": dip_seq}
        dip_copies = {"DIPLOID*SEQ": 2}
        for gname, ai_list in spec.items():
            g = synth_index.genes[gname]
            msa = synth_genes[gname.split("*")[0]]
            for ai in ai_list:
                a = g.alleles[ai]
                copies[a] = copies.get(a, 0) + 1
                seqs[a] = alleleUngappedSeq(msa, a)
        sim = simulatePairedReads(
            seqs, depth=22, seed=50 + s, error_rate=0.002,
            allele_copies={**copies, **dip_copies}, sample_name=f"w{s}",
        )
        r1 = str(d / f"wgs.{s}.read.1.fq.gz")
        r2 = str(d / f"wgs.{s}.read.2.fq.gz")
        writeFastq(r1, sim.names, sim.r1)
        writeFastq(r2, sim.names, sim.r2)
        rows.append({"id": f"s{s}", "r1": r1, "r2": r2})
        truth.append(copies)
    pd.DataFrame(rows).to_csv(str(d / "cohort.csv"), index=False)

    # truth tables for the evaluation paths
    genes = list(synth_index.gene_names)
    cn_truth = pd.DataFrame(
        {
            f"s{s}": [
                sum(
                    c for a, c in truth[s].items()
                    if a in synth_index.genes[g].alleles
                )
                for g in genes
            ]
            for s in range(len(specs))
        },
        index=genes,
    )
    cn_truth.index.name = "gene"
    cn_truth.to_csv(str(d / "cn_truth.tsv"), sep="\t")
    with open(str(d / "allele_truth.tsv"), "w") as f:
        f.write("id\talleles\n")
        for s, copies in enumerate(truth):
            alleles = "_".join(a for a, c in copies.items() for _ in range(c))
            f.write(f"s{s}\t{alleles}\n")
    return d, (kir_lo, kir_hi), (dip_lo, dip_hi), truth


def test_real_cohort_end_to_end(real_cohort, synth_index):
    d, (kir_lo, kir_hi), (dip_lo, dip_hi), truth = real_cohort
    old_kir, old_dip = wx.KIR_REGIONS, wx.REGIONS_OF_DIPLOID
    wx.KIR_REGIONS = {"hg19": [f"chrT:{kir_lo}-{kir_hi}"]}
    wx.REGIONS_OF_DIPLOID = {"hg19": {"VDR": f"chrT:{dip_lo}-{dip_hi}"}}
    try:
        args = createParser().parse_args(
            [
                "--cohort-csv", str(d / "cohort.csv"),
                "--out", str(d / "out"),
                "--index-prefix", str(d / "index"),
                "--genome", str(d / "genome.fa"),
                "--diploid-gene", "VDR",
                "--allele-method", "full",
                "--allele-top-n", "200",
                "--threads", "2",
                "--cn-truth", str(d / "cn_truth.tsv"),
                "--allele-truth", str(d / "allele_truth.tsv"),
            ]
        )
        report = main(args)
    finally:
        wx.KIR_REGIONS, wx.REGIONS_OF_DIPLOID = old_kir, old_dip

    assert report["samples"] == 2
    # CN fully recovered through the diploid-depth normalisation path
    assert report["cn_acc"] == 1.0
    # allele calls: perfect 7-digit F1 on this clean cohort
    assert report["allele_eval"][7]["f1"] == 1.0

    al = pd.read_csv(str(d / "out" / "real.allele.tsv"), sep="\t")
    assert len(al) == 2
    for s, copies in enumerate(truth):
        called = sorted(al.iloc[s]["alleles"].split("_"))
        assert called == sorted(
            a for a, c in copies.items() for _ in range(c)
        )
