"""SAM export, HISAT2-format export, task executors."""
import os

import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, encodeReads
from kir_graph_tpu.align.sam_export import writeSam
from kir_graph_tpu.index.hisat_format import exportHisatFormat
from kir_graph_tpu.parallel.tasks import ConcurrentTaskExecutor, Task
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


def test_sam_export(tmp_path, synth_genes, synth_index):
    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    allele = g.alleles[0]
    seqs = {allele: alleleUngappedSeq(synth_genes[gname.split("*")[0]], allele)}
    sim = simulatePairedReads(seqs, depth=2, seed=21)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    res = GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)
    out = str(tmp_path / "out.sam")
    writeSam(out, res, synth_index, names=sim.names)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("@HD")
    sq = [l for l in lines if l.startswith("@SQ")]
    assert len(sq) == len(synth_index.gene_names)
    body = [l for l in lines if not l.startswith("@")]
    assert body
    cols = body[0].split("\t")
    assert cols[2] == gname          # RNAME
    assert cols[5].endswith("M")     # CIGAR ends in match run
    assert "NH:i:" in body[0]


def test_hisat_format_export(tmp_path, synth_genes):
    prefix = str(tmp_path / "hisat")
    exportHisatFormat(synth_genes, prefix)
    for ext in (".snp", ".index.snp", ".link", ".haplotype", ".locus",
                "_backbone.fa", "_sequences.fa", ".allele", ".snp.freq"):
        assert os.path.exists(prefix + ext), ext
    snp = open(prefix + ".snp").read().splitlines()
    index_snp = open(prefix + ".index.snp").read().splitlines()
    assert len(snp) >= len(index_snp) > 0
    # snp line format: id typ ref pos val
    fields = snp[0].split("\t")
    assert fields[0].startswith("hv")
    assert fields[1] in ("single", "deletion")
    link = open(prefix + ".link").read().splitlines()
    assert len(link) == len(snp)


def test_concurrent_task_executor(tmp_path):
    calls = []

    def make(i):
        def fn():
            calls.append(i)
            with open(str(tmp_path / f"t{i}.out"), "w") as f:
                f.write("x")
        return fn

    tasks = [Task(output=str(tmp_path / f"t{i}.out"), fn=make(i)) for i in range(5)]
    # pre-create one output -> that task must be skipped
    with open(tasks[0].output, "w") as f:
        f.write("cached")
    ex = ConcurrentTaskExecutor(threads=3)
    outs = ex.run(tasks)
    assert len(outs) == 5
    assert 0 not in calls and sorted(calls) == [1, 2, 3, 4]
