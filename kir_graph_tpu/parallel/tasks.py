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


class SlurmTaskExecutor:
    """sbatch each task; poll for output files (reference kg_utils.py:75-121)."""

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
            subprocess.run(["sbatch", fname], check=True)
            logger.info(f"[Tasks] submitted {fname}")

        deadline = time.time() + self.timeout_s
        while time.time() < deadline:
            if all(_taskDone(t) for t in todo):
                break
            time.sleep(self.poll_s)
        missing = [t.output for t in todo if not _taskDone(t)]
        if missing:
            raise TimeoutError(f"SLURM tasks incomplete: {missing}")
        return [t.output for t in tasks]
