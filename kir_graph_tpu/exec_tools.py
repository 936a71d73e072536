"""
External-tool engine abstraction (reference external_tools.py).

Only the cold index-construction path (MUSCLE/ClustalO block realignment)
and the kirpipe comparison harness shell out; the serving pipeline never
does.  Engines: local | docker | podman | singularity; a tool can also be
marked 'builtin' to use the in-repo implementation.
"""
from __future__ import annotations

import shutil
import subprocess
from dataclasses import dataclass, field

from .utils import logger


@dataclass
class EngineConfig:
    name: str = "local"
    binds: list[str] = field(default_factory=list)

    def wrap(self, image: str, cmd: list[str]) -> list[str]:
        if self.name == "local":
            return cmd
        if self.name in ("docker", "podman"):
            binds = [x for b in self.binds for x in ("-v", f"{b}:{b}")]
            return [
                self.name, "run", "-it", "--rm", "-w", "/app",
                "-v", "./:/app", *binds, image, *cmd,
            ]
        if self.name == "singularity":
            return ["singularity", "run", f"docker://{image}", *cmd]
        raise NotImplementedError(self.name)


# pinned images (reference external_tools.py:82-88)
TOOL_IMAGES = {
    "samtools": "quay.io/biocontainers/samtools:1.15.1--h1170115_0",
    "clustalo": "quay.io/biocontainers/clustalo:1.2.4--h1b792b2_4",
    "hisat": "quay.io/biocontainers/hisat2:2.2.1--h87f3376_4",
    "muscle": "quay.io/biocontainers/muscle:5.1--h9f5acd7_1",
    "bwa": "quay.io/biocontainers/bwa:0.7.17-hed695b0_7",
}

_engine = EngineConfig()
_custom_images: dict[str, str] = {}


def setEngine(name: str, binds: list[str] | None = None) -> None:
    global _engine
    _engine = EngineConfig(name=name, binds=binds or [])


def getEngine() -> EngineConfig:
    return _engine


def addCustomEngine(tool: str, image: str) -> None:
    _custom_images[tool] = image


def toolAvailable(binary: str) -> bool:
    return shutil.which(binary) is not None


def runShell(
    cmd: list[str], capture_output: bool = False, cwd: str | None = None
) -> subprocess.CompletedProcess:
    logger.debug(f"[Run] {' '.join(cmd)}")
    return subprocess.run(
        cmd,
        shell=False,
        capture_output=capture_output,
        cwd=cwd,
        check=True,
        universal_newlines=True,
    )


def runTool(
    tool: str, cmd: list[str], capture_output: bool = False
) -> subprocess.CompletedProcess:
    image = _custom_images.get(tool) or TOOL_IMAGES.get(tool, "")
    full = _engine.wrap(image, cmd)
    return runShell(full, capture_output=capture_output)
