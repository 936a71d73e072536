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


def _fakeSlurmBin(tmp_path, sacct_state: str, make_output: bool = False):
    """A fake sbatch/sacct pair on PATH: sbatch prints a job id (and
    optionally creates the output file); sacct reports `sacct_state`."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    sbatch = bindir / "sbatch"
    lines = ["#!/bin/sh"]
    if make_output:
        # real SLURM runs the script asynchronously; completing instantly
        # models a fast successful job
        lines.append('out=$(grep "^#SBATCH -o" "$1" | sed "s/.*-o //;s/.slurm.log//")')
        lines.append('touch "$out"')
    lines.append('echo "Submitted batch job 4242"')
    sbatch.write_text("\n".join(lines) + "\n")
    sbatch.chmod(0o755)
    sacct = bindir / "sacct"
    sacct.write_text(
        "#!/bin/sh\n" f'echo "4242|{sacct_state}"\n'
    )
    sacct.chmod(0o755)
    return str(bindir)


def test_slurm_executor_fails_fast_on_dead_job(tmp_path, monkeypatch):
    """A FAILED job with no output must raise immediately, not after the
    24 h file-poll timeout (the reference only polls files)."""
    import pytest

    from kir_graph_tpu.parallel.tasks import SlurmTaskExecutor, Task

    monkeypatch.setenv(
        "PATH", _fakeSlurmBin(tmp_path, "FAILED") + ":" + os.environ["PATH"]
    )
    ex = SlurmTaskExecutor(poll_s=0.01, timeout_s=30.0)
    t = Task(output=str(tmp_path / "a.out"), cmd=["true"])
    with pytest.raises(RuntimeError, match="job 4242 FAILED"):
        ex.run([t])


def test_slurm_executor_cancelled_by_suffix(tmp_path, monkeypatch):
    from kir_graph_tpu.parallel.tasks import SlurmTaskExecutor, Task
    import pytest

    monkeypatch.setenv(
        "PATH",
        _fakeSlurmBin(tmp_path, "CANCELLED by 1001") + ":" + os.environ["PATH"],
    )
    ex = SlurmTaskExecutor(poll_s=0.01, timeout_s=30.0)
    t = Task(output=str(tmp_path / "b.out"), cmd=["true"])
    with pytest.raises(RuntimeError, match="CANCELLED"):
        ex.run([t])


def test_slurm_executor_success_with_running_state(tmp_path, monkeypatch):
    """RUNNING/COMPLETED states never trip the failure check; the output
    file remains the completion signal."""
    from kir_graph_tpu.parallel.tasks import SlurmTaskExecutor, Task

    monkeypatch.setenv(
        "PATH",
        _fakeSlurmBin(tmp_path, "COMPLETED", make_output=True)
        + ":" + os.environ["PATH"],
    )
    ex = SlurmTaskExecutor(poll_s=0.01, timeout_s=30.0)
    t = Task(output=str(tmp_path / "c.out"), cmd=["true"])
    assert ex.run([t]) == [t.output]
