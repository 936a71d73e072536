"""
kirpipe framework: wildcard file patterns, shell/container executor, and
the KirPipe tool base class (reference kir/kir_pipe.py).

Sample sets are referenced by a `{}` wildcard pattern
(e.g. `data/cohort.{}.read`); each tool consumes the matching files and
produces `{name}.{tool}_merge.tsv` allele tables that the CLI merges.
"""
from __future__ import annotations

import glob
import os
import re
import shlex
import subprocess
import uuid
from typing import Any, ClassVar, Type

import pandas as pd

from ..utils import logger


class FileMod:
    """Filename wildcard listing / sample-id extraction."""

    def __init__(self) -> None:
        self.input_pattern = ""

    def setPattern(self, pattern: str) -> None:
        self.input_pattern = pattern

    @staticmethod
    def extractIDFromPattern(pattern: str, query: str) -> list[str]:
        return re.findall(
            r"([^\.]*)".join(map(re.escape, pattern.split("{}"))), query
        )

    def getID(self, name: str) -> str:
        assert self.input_pattern
        return self.extractIDFromPattern(self.input_pattern, name)[0]

    def listFiles(self, name: str) -> list[str]:
        found = set()
        for candidate in glob.glob(name.replace("{}", "*") + "*"):
            if "{}" not in name:
                found.add(name)
                break
            ids = self.extractIDFromPattern(name, candidate)
            if ids:
                found.add(name.format(ids[0]))
        return sorted(found)

    def replaceWildcard(self, name: str, new_name: str) -> str:
        if ".{}" in name:
            return name.replace(".{}", new_name)
        if "{}" not in name:
            return name + "." + new_name
        raise NotImplementedError(name)


class Executor:
    """Run commands via shell or a container engine."""

    def __init__(self, engine_type: str = "docker") -> None:
        self.engine = engine_type

    def setEngine(self, engine_type: str) -> None:
        assert engine_type in ("podman", "docker", "local")
        self.engine = engine_type

    def runShell(
        self, cmd: str, cwd: str | None = None,
        env: dict[str, str] | None = None,
    ) -> subprocess.CompletedProcess:
        """Run a command string as an argv list (shell=False) so filenames
        with shell metacharacters cannot break or inject commands."""
        logger.info(f"[Run] {cmd}")
        return subprocess.run(
            shlex.split(cmd), cwd=cwd, check=True, universal_newlines=True,
            env={**os.environ, **env} if env else None,
        )

    def runDocker(
        self, image: str, cmd: str, cwd: str | None = None, opts: str = ""
    ) -> subprocess.CompletedProcess:
        if self.engine == "local":
            # container env options are load-bearing (e.g. PING's
            # RAW_FASTQ_DIR/RESULTS_DIR config) — carry `-e K=V` pairs
            # into the local process environment
            env = {}
            toks = shlex.split(opts)
            for i, t in enumerate(toks):
                if t == "-e" and i + 1 < len(toks) and "=" in toks[i + 1]:
                    k, _, v = toks[i + 1].partition("=")
                    env[k] = v
            return self.runShell(cmd, cwd, env=env or None)
        name = str(uuid.uuid4()).split("-", 1)[0]
        host_dir = shlex.quote(os.getcwd())
        return self.runShell(
            f"{self.engine} run -it --rm --name {name} {opts} "
            f"-v {host_dir}:/app -w /app/{cwd or ''} {image} {cmd}"
        )

    def checkImage(self, image: str) -> bool:
        try:
            self.runShell(
                f"sh -c 'if [ ! $({self.engine} image ls {image} -q) ]; "
                "then exit 1; fi'"
            )
            return True
        except subprocess.CalledProcessError:
            return False

    def buildImage(
        self, image: str, dockerfile: str, folder: str = ".",
        args: dict[str, str] = {},
    ) -> subprocess.CompletedProcess:
        build_args = "".join(f" --build-arg {k}={v} " for k, v in args.items())
        return self.runShell(
            f"{self.engine} build {folder} -f {dockerfile} -t {image} {build_args}"
        )


class KirPipe:
    """Base class for one KIR-typing tool adapter."""

    name: ClassVar[str] = ""

    def __init__(
        self,
        threads: int = 4,
        file_adapter: Type[FileMod] = FileMod,
        executor: Type[Executor] = Executor,
    ) -> None:
        self.images: dict[str, str] = {}
        self.file_adapter = file_adapter()
        self.executor = executor()
        self.threads = threads
        self.ipd_version = ""

    def getThreads(self) -> int:
        return self.threads

    def setThreads(self, threads: int) -> None:
        self.threads = threads

    def setIPDVersion(self, version: str) -> None:
        self.ipd_version = version

    def runShell(self, cmd: str, cwd: str | None = None):
        return self.executor.runShell(cmd, cwd)

    def runDocker(self, image: str, cmd: str, cwd: str | None = None, opts: str = ""):
        return self.executor.runDocker(self.images.get(image, image), cmd, cwd, opts)

    def checkImage(self, image: str) -> bool:
        return self.executor.checkImage(self.images.get(image, image))

    def buildImage(self, image: str, dockerfile: str, folder: str = ".",
                   args: dict[str, str] = {}):
        return self.executor.buildImage(
            self.images.get(image, image), dockerfile, folder, args
        )

    def getID(self, name: str) -> str:
        return self.file_adapter.getID(name)

    def listFiles(self, name: str) -> list[str]:
        return self.file_adapter.listFiles(name)

    def replaceWildcard(self, name: str, new_name: str) -> str:
        return self.file_adapter.replaceWildcard(name, new_name)

    def escapeName(self, name: str) -> str:
        return name.replace(".", "_").replace("/", "_")

    def savePredictedAllele(
        self, samples_alleles: list[dict[str, Any]], output_name: str
    ) -> pd.DataFrame:
        assert samples_alleles
        for sample in samples_alleles:
            sample["alleles"] = "_".join(sample["alleles"])
        df = pd.DataFrame(samples_alleles)
        df.to_csv(f"{output_name}.tsv", index=False, sep="\t")
        return df

    def runAll(self, input_name: str) -> str:
        raise NotImplementedError
