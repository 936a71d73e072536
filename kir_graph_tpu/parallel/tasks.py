"""
File-keyed task executors (the reference's namepipe/SLURM pattern,
SURVEY §2.4): every task's cache key is its output filename, so re-running
a cohort resumes for free and failed jobs re-run idempotently.

* ConcurrentTaskExecutor — thread pool over samples on one host
* SlurmTaskExecutor — sbatch one job per task from a template
"""
from __future__ import annotations

import os
import subprocess
import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from dataclasses import dataclass, field
from typing import Callable

from ..utils import logger


@dataclass
class Task:
    """One unit of work producing `output` (skipped when it exists)."""

    output: str
    fn: Callable[[], object] | None = None       # in-process work
    cmd: list[str] | None = None                 # or a shell command
    done_suffix: str = ""                        # extra existence check


def _taskDone(task: Task) -> bool:
    return os.path.exists(task.output + task.done_suffix)


class ConcurrentTaskExecutor:
    def __init__(self, threads: int = 8):
        self.threads = threads

    def run(self, tasks: list[Task]) -> list[str]:
        todo = [t for t in tasks if not _taskDone(t)]
        logger.info(
            f"[Tasks] {len(tasks) - len(todo)} cached, {len(todo)} to run "
            f"({self.threads} workers)"
        )

        def one(task: Task):
            if task.fn is not None:
                task.fn()
            elif task.cmd:
                subprocess.run(task.cmd, check=True)
            return task.output

        with ThreadPoolExecutor(max_workers=self.threads) as pool:
            futures = {pool.submit(one, t): t for t in todo}
            for fut in as_completed(futures):
                fut.result()  # propagate errors
        return [t.output for t in tasks]


DEFAULT_SBATCH_TEMPLATE = """#!/bin/bash
#SBATCH -J {name}
#SBATCH -c {threads}
#SBATCH --mem {mem}
#SBATCH -o {output}.slurm.log
{command}
"""


# terminal sacct/squeue states that mean a job will never produce output
_SLURM_DEAD_STATES = (
    "FAILED",
    "CANCELLED",
    "TIMEOUT",
    "OUT_OF_MEMORY",
    "NODE_FAIL",
    "PREEMPTED",
    "BOOT_FAIL",
    "DEADLINE",
)


class SlurmTaskExecutor:
    """sbatch each task; poll output files AND job state.

    The reference polls only output files (kg_utils.py:75-121), so a
    crashed job surfaces as a 24 h TimeoutError.  Here each sbatch's job
    id is captured and ``sacct`` (fallback ``squeue``) is consulted every
    poll: a job in a terminal failure state with no output fails the run
    immediately, pointing at its .slurm.log.
    """

    def __init__(
        self,
        template: str = DEFAULT_SBATCH_TEMPLATE,
        threads: int = 2,
        mem: str = "8G",
        poll_s: float = 30.0,
        timeout_s: float = 86400.0,
    ):
        self.template = template
        self.threads = threads
        self.mem = mem
        self.poll_s = poll_s
        self.timeout_s = timeout_s

    @staticmethod
    def _parseJobId(sbatch_stdout: str) -> str | None:
        # "Submitted batch job 12345"
        for tok in sbatch_stdout.split():
            if tok.isdigit():
                return tok
        return None

    @staticmethod
    def _jobStates(job_ids: list[str]) -> dict[str, str]:
        """{job_id: STATE} via sacct, falling back to squeue; jobs the
        tools don't know (yet) are simply absent from the result."""
        ids = [j for j in job_ids if j]
        if not ids:
            return {}
        try:
            r = subprocess.run(
                [
                    "sacct", "-j", ",".join(ids),
                    "--format=JobID,State", "-n", "-P", "-X",
                ],
                capture_output=True, text=True, timeout=60,
            )
            if r.returncode == 0 and r.stdout.strip():
                states = {}
                for line in r.stdout.strip().splitlines():
                    parts = line.split("|")
                    if len(parts) >= 2:
                        # strip "CANCELLED by 123" suffixes
                        states[parts[0]] = parts[1].split()[0]
                return states
        except (OSError, subprocess.TimeoutExpired):
            pass
        try:
            r = subprocess.run(
                ["squeue", "-j", ",".join(ids), "-h", "-o", "%i %T"],
                capture_output=True, text=True, timeout=60,
            )
            if r.returncode == 0:
                states = {}
                for line in r.stdout.strip().splitlines():
                    parts = line.split()
                    if len(parts) >= 2:
                        states[parts[0]] = parts[1]
                return states
        except (OSError, subprocess.TimeoutExpired):
            pass
        return {}

    def run(self, tasks: list[Task]) -> list[str]:
        # SLURM submits argv commands; a fn-only Task cannot ship to a
        # batch node — fail loudly instead of returning its output path
        # as if it had run (use ConcurrentTaskExecutor for fn tasks)
        fn_only = [t.output for t in tasks if not _taskDone(t) and not t.cmd]
        if fn_only:
            raise ValueError(
                "SlurmTaskExecutor cannot run fn-only tasks (no cmd): "
                f"{fn_only} — use ConcurrentTaskExecutor"
            )
        todo = [t for t in tasks if not _taskDone(t) and t.cmd]
        job_of: dict[str, Task] = {}
        for task in todo:
            script = self.template.format(
                name=os.path.basename(task.output),
                threads=self.threads,
                mem=self.mem,
                output=task.output,
                command=" ".join(task.cmd or []),
            )
            fname = task.output + ".sbatch"
            with open(fname, "w") as f:
                f.write(script)
            r = subprocess.run(
                ["sbatch", fname], check=True, capture_output=True, text=True
            )
            job_id = self._parseJobId(r.stdout)
            if job_id:
                job_of[job_id] = task
            logger.info(f"[Tasks] submitted {fname} (job {job_id})")

        deadline = time.time() + self.timeout_s
        while time.time() < deadline:
            if all(_taskDone(t) for t in todo):
                break
            states = self._jobStates(list(job_of))
            dead = [
                (jid, st)
                for jid, st in states.items()
                if any(st.startswith(d) for d in _SLURM_DEAD_STATES)
                and not _taskDone(job_of[jid])
            ]
            if dead:
                detail = ", ".join(
                    f"job {jid} {st} -> {job_of[jid].output} "
                    f"(see {job_of[jid].output}.slurm.log)"
                    for jid, st in dead
                )
                raise RuntimeError(f"SLURM jobs failed: {detail}")
            time.sleep(self.poll_s)
        missing = [t.output for t in todo if not _taskDone(t)]
        if missing:
            raise TimeoutError(f"SLURM tasks incomplete: {missing}")
        return [t.output for t in tasks]
