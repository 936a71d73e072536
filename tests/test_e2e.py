"""End-to-end cohort test: simulated FASTQs -> CLI -> cohort CN + allele
tables matching the simulated truth (the reference's golden-example
strategy, SURVEY §4.1, replayed on the synthetic DB)."""
import os

import numpy as np
import pandas as pd
import pytest

from kir_graph_tpu.index.build import saveIndex
from kir_graph_tpu.msa.genemsa import saveAllMsa
from kir_graph_tpu.pipeline.main import createParser, main
from kir_graph_tpu.sim.reads import simulatePairedReads, writeFastq
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def cohort(tmp_path_factory, synth_genes, synth_index):
    """Two samples with known allele sets incl. CN variation."""
    d = tmp_path_factory.mktemp("e2e")
    saveIndex(synth_index, str(d / "index"))

    gnames = synth_index.gene_names
    # KIR3DL3 must be diploid in every sample (the CN model anchors on it,
    # like real KIR haplotypes); other genes vary CN 0..2
    g3dl3 = next(n for n in gnames if "3DL3" in n)
    others = [n for n in gnames if n != g3dl3]

    def alleles_of(spec):
        out = {}
        for gname, ai_list in spec.items():
            g = synth_index.genes[gname]
            for ai in ai_list:
                out.setdefault(g.alleles[ai], 0)
                out[g.alleles[ai]] += 1
        return out

    specs = [
        {g3dl3: [3, 3], others[0]: [0, 5], others[1]: [7]},
        {g3dl3: [1, 6], others[0]: [5], others[1]: [2, 9], others[2]: [4, 4]},
    ]
    rows = []
    truth = []
    for s, spec in enumerate(specs):
        copies = alleles_of(spec)
        seqs = {}
        for gname, ai_list in spec.items():
            g = synth_index.genes[gname]
            msa = synth_genes[gname.split("*")[0]]
            for ai in set(ai_list):
                seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
        sim = simulatePairedReads(
            seqs,
            depth=22,
            seed=100 + s,
            error_rate=0.002,
            allele_copies=copies,
            sample_name=f"s{s}",
        )
        r1 = str(d / f"sample.{s}.read.1.fq.gz")
        r2 = str(d / f"sample.{s}.read.2.fq.gz")
        writeFastq(r1, sim.names, sim.r1)
        writeFastq(r2, sim.names, sim.r2)
        rows.append({"name": str(d / f"sample.{s}"), "r1": r1, "r2": r2})
        truth.append({"copies": copies, "spec": spec})
    csv = str(d / "cohort.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return d, csv, truth


def test_cli_end_to_end(cohort, synth_index):
    d, csv, truth = cohort
    args = createParser().parse_args(
        [
            "--input-csv", csv,
            "--index-prefix", str(d / "index"),
            "--output-cohort-name", str(d / "cohort"),
            "--allele-top-n", "200",
            "--plot",
        ]
    )
    main(args)

    # --plot drove the report writer (reference main.py plot step)
    plot_html = str(d / "cohort.plot.html")
    assert os.path.exists(plot_html), "CLI --plot produced no report"
    assert os.path.getsize(plot_html) > 500

    # --- CN table
    cn = pd.read_csv(str(d / "cohort.cn.tsv"), sep="\t", index_col=0)
    assert cn.shape[1] == 2
    for s, t in enumerate(truth):
        col = cn.columns[s]
        expected = {}
        for gname in synth_index.gene_names:
            g = synth_index.genes[gname]
            n = sum(
                cnt for a, cnt in t["copies"].items() if a in g.alleles
            )
            expected[gname] = n
        got = dict(cn[col])
        assert got == expected, f"sample {s}: {got} != {expected}"

    # --- allele table
    al = pd.read_csv(str(d / "cohort.allele.tsv"), sep="\t")
    assert len(al) == 2
    for s, t in enumerate(truth):
        called = sorted(al.iloc[s]["alleles"].split("_"))
        expected = sorted(
            a for a, cnt in t["copies"].items() for _ in range(cnt)
        )
        assert called == expected, f"sample {s}: {called} != {expected}"


def test_cli_resume_skips_mapping(cohort, capsys):
    """Stage outputs exist -> pipeline resumes without re-aligning."""
    d, csv, truth = cohort
    args = createParser().parse_args(
        [
            "--input-csv", csv,
            "--index-prefix", str(d / "index"),
            "--output-cohort-name", str(d / "cohort"),
        ]
    )
    main(args)  # must be fast / not crash; outputs still there
    assert os.path.exists(str(d / "cohort.allele.tsv"))


def test_map_cohort_matches_per_sample(cohort, synth_index, tmp_path):
    """mapCohort's cross-sample pipelining must produce byte-identical
    artifacts to the serial mapSample path."""
    import gzip
    import json
    import shutil

    from kir_graph_tpu.pipeline.run import SamplePipeline

    d, csv, truth = cohort
    rows = pd.read_csv(csv)
    jobs = []
    for mode in ("serial", "overlap"):
        for _, r in rows.iterrows():
            base = os.path.basename(str(r["name"]))
            jobs.append((str(tmp_path / f"{mode}.{base}"), r["r1"], r["r2"]))
    serial_jobs, overlap_jobs = jobs[: len(rows)], jobs[len(rows):]

    pipe = SamplePipeline(synth_index)
    os.environ["KGT_SYNC_WRITES"] = "1"
    try:
        for j in serial_jobs:
            pipe.mapSample(*j)
        pipe.flushWrites()
        out = pipe.mapCohort(overlap_jobs)
        pipe.flushWrites()
    finally:
        os.environ.pop("KGT_SYNC_WRITES", None)

    assert out == [name + ".variant" for name, _, _ in overlap_jobs]
    for (sn, _, _), (on, _, _) in zip(serial_jobs, overlap_jobs):
        for suf in (".variant.json", ".variant.no_multi.depth.tsv",
                    ".variant.stat.json"):
            with open(sn + suf, "rb") as f1, open(on + suf, "rb") as f2:
                assert f1.read() == f2.read(), suf
        a = np.load(sn + ".variant.placements.npz")
        b = np.load(on + ".variant.placements.npz")
        assert set(a.files) == set(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k])
        np.testing.assert_array_equal(
            np.load(sn + ".variant.pileup.npy"),
            np.load(on + ".variant.pileup.npy"),
        )


def test_map_cohort_oversized_fallback(cohort, synth_index, tmp_path):
    """A sample bigger than one device chunk mid-cohort takes the
    streaming mapSample fallback; outputs still match the serial path."""
    from kir_graph_tpu.pipeline.run import SamplePipeline

    d, csv, truth = cohort
    rows = pd.read_csv(csv)
    jobs = [
        (str(tmp_path / f"fb.{os.path.basename(str(r['name']))}"),
         r["r1"], r["r2"])
        for _, r in rows.iterrows()
    ]
    pipe = SamplePipeline(synth_index)
    # shrink the chunk so the middle sample exceeds it (instance
    # override; 256 is a real pad bucket so every shape stays bucketed)
    pipe.aligner.CHUNK_PAIRS = 256
    os.environ["KGT_SYNC_WRITES"] = "1"
    try:
        out = pipe.mapCohort(jobs)
        pipe.flushWrites()
    finally:
        os.environ.pop("KGT_SYNC_WRITES", None)
    for prefix in out:
        assert os.path.exists(prefix + ".json")
        assert os.path.exists(prefix + ".no_multi.depth.tsv")
    # depth equal to an un-shrunk serial run on sample 0
    pipe2 = SamplePipeline(synth_index)
    ref_prefix = pipe2.mapSample(
        str(tmp_path / "fb.ref0"), jobs[0][1], jobs[0][2]
    )
    pipe2.flushWrites()
    a = pd.read_csv(out[0] + ".no_multi.depth.tsv", sep="\t", header=None)
    b = pd.read_csv(ref_prefix + ".no_multi.depth.tsv", sep="\t", header=None)
    pd.testing.assert_frame_equal(a, b)
