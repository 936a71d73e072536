import os

import pandas as pd
import pytest

from kir_graph_tpu.harness import FileMod, GraphKirTool
from kir_graph_tpu.index.build import saveIndex
from kir_graph_tpu.sim.cohort import (
    generateCohortFastq,
    sampleCohortAlleles,
    syntheticHaplotypeTable,
)


def test_filemod_wildcards(tmp_path):
    fm = FileMod()
    fm.setPattern(str(tmp_path / "cohort.{}"))
    for sid in ("00", "01"):
        open(str(tmp_path / f"cohort.{sid}.read.1.fq.gz"), "w").close()
    files = fm.listFiles(str(tmp_path / "cohort.{}"))
    assert files == [str(tmp_path / "cohort.00"), str(tmp_path / "cohort.01")]
    assert fm.getID(str(tmp_path / "cohort.01.read.1.fq.gz")) == "01"
    assert fm.replaceWildcard(str(tmp_path / "cohort.{}"), "_merge").endswith(
        "cohort_merge"
    )


def test_graphkir_tool_end_to_end(tmp_path, synth_genes, synth_index):
    saveIndex(synth_index, str(tmp_path / "index"))
    haplo = syntheticHaplotypeTable(
        [n.split("*")[0] for n in synth_index.gene_names], seed=3
    )
    truths = sampleCohortAlleles(synth_index, haplo, n_samples=2, seed=8)
    # ensure non-empty allele sets
    truths = [t for t in truths if t.alleles][:2]
    assert truths
    prefix = str(tmp_path / "cohort")
    generateCohortFastq(synth_genes, synth_index, truths, prefix, depth=18, seed=6)

    tool = GraphKirTool(index_prefix=str(tmp_path / "index"))
    tool.file_adapter.setPattern(prefix + ".{}")
    final = tool.runAll(prefix + ".{}")
    df = pd.read_csv(final + ".tsv", sep="\t")
    assert len(df) == len(truths)
    # calls should match the simulated truth at the full-resolution level
    from kir_graph_tpu.eval import compareCohort, calcSummaryByResolution

    answer = {t.sample_id: t.alleles for t in truths}
    predict = {
        str(row["id"]).zfill(2): str(row["alleles"]).split("_")
        for _, row in df.iterrows()
    }
    res = compareCohort(answer, predict)
    summary = calcSummaryByResolution(r for rs in res.values() for r in rs)
    assert summary["match7"] >= 0.8 * summary["total"]
    assert summary["FN"] + summary["FP"] <= 1


def test_slurm_executor_rejects_fn_tasks(tmp_path):
    """fn-only tasks cannot ship to a batch node: the SLURM executor
    must raise instead of returning their outputs as if they ran."""
    import pytest

    from kir_graph_tpu.parallel.tasks import SlurmTaskExecutor, Task

    t = Task(output=str(tmp_path / "x.out"), fn=lambda: None)
    with pytest.raises(ValueError, match="fn-only"):
        SlurmTaskExecutor().run([t])


def test_run_docker_local_engine_carries_env(tmp_path, monkeypatch):
    """Engine 'local' must carry container -e K=V options into the
    subprocess environment (PING's RAW_FASTQ_DIR etc. are config)."""
    from kir_graph_tpu.harness.pipe import Executor

    ex = Executor(engine_type="local")
    seen = {}

    def fakeShell(cmd, cwd=None, env=None):
        seen["cmd"], seen["env"] = cmd, env
        return None

    monkeypatch.setattr(ex, "runShell", fakeShell)
    ex.runDocker(
        "img", "run_me --flag",
        opts=" -v /a:/b:ro -e RAW_FASTQ_DIR=/data -e THREADS=4",
    )
    assert seen["cmd"] == "run_me --flag"
    assert seen["env"] == {"RAW_FASTQ_DIR": "/data", "THREADS": "4"}
