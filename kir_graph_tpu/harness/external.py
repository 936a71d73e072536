"""
Adapters for the four competing KIR pipelines the reference benchmarks
against (kir/ping.py, kir/t1k.py, kir/sakauekir.py, kir/kpi.py).  Each
drives the published container images over the same `{}` sample wildcard
and normalises the output into the kirpipe allele-table format.  They
require a container engine (docker/podman) and the upstream images/repos;
without one, `available()` is False and runAll raises with instructions.
"""
from __future__ import annotations

import os
import shutil

import pandas as pd

from ..utils import logger
from .pipe import KirPipe


class ContainerTool(KirPipe):
    def available(self) -> bool:
        return shutil.which(self.executor.engine) is not None

    def _requireEngine(self) -> None:
        if not self.available():
            raise RuntimeError(
                f"{self.name} needs a container engine "
                f"({self.executor.engine}); none found on PATH"
            )


class T1kTool(ContainerTool):
    """T1K (run-t1k --preset kir-wgs); quality>5 filter on output."""

    name = "t1k"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.images = {"t1k": "localhost/c4lab/t1k"}
        self.folder = "t1k"

    def build(self, dat_file: str = "kir.dat") -> str:
        self._requireEngine()
        if not self.checkImage("t1k"):
            self.buildImage("t1k", f"{self.folder}.dockerfile")
        idx = f"{self.folder}/idx"
        if not os.path.exists(idx):
            self.runDocker(
                "t1k", f"t1k-build.pl -o {idx} -d {dat_file}", cwd=self.folder
            )
        return idx

    def run(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = input_name + ".t1k"
        self.runDocker(
            "t1k",
            f"run-t1k -1 {input_name}.read.1.fq.gz -2 {input_name}.read.2.fq.gz"
            f" --preset kir-wgs -f {index}/kiridx_dna_seq.fa"
            f" -t {self.getThreads()} -o {output_name}",
        )
        return output_name

    def readAlleles(self, name: str) -> list[str]:
        df = pd.read_csv(
            name + "_genotype.tsv",
            sep="\t",
            names=[
                "gene", "num", "allele1", "abundance1", "quality1",
                "allele2", "abundance2", "quality2", "extra",
            ],
        )
        alleles = []
        for _, row in df.iterrows():
            if int(row["num"]) >= 1 and float(row["quality1"]) > 5:
                alleles.append(str(row["allele1"]))
            if int(row["num"]) >= 2 and float(row["quality2"]) > 5:
                alleles.append(str(row["allele2"]))
        return alleles

    def runAll(self, input_name: str) -> str:
        index = self.build()
        samples = []
        for name in self.listFiles(input_name):
            out = self.run(name, index)
            samples.append(
                {"id": self.getID(name), "alleles": self.readAlleles(out), "name": out}
            )
        final = self.replaceWildcard(input_name, "_t1k_final")
        self.savePredictedAllele(samples, final)
        return final


class PingTool(ContainerTool):
    """PING R pipeline (clone + run in container, parse
    finalAlleleCalls.csv). CN thresholding may require manual review —
    the same caveat the reference documents (research/other_kir.py:414)."""

    name = "ping"

    def __init__(self, version: str = "20220527", **kwargs):
        super().__init__(**kwargs)
        self.version = version
        self.images = {"ping": "localhost/c4lab/ping"}
        self.folder = "PING"

    def run(self, input_folder: str, output_folder: str) -> str:
        self._requireEngine()
        self.runDocker(
            "ping",
            "Rscript PING_run.R",
            opts=(
                f" -e RAW_FASTQ_DIR=../{input_folder}"
                f" -e FASTQ_PATTERN=fq"
                f" -e THREADS={self.getThreads()}"
                f" -e RESULTS_DIR=../{output_folder}"
            ),
            cwd=self.folder,
        )
        return output_folder

    @staticmethod
    def readAllele(csv_file: str) -> dict[str, list[str]]:
        """finalAlleleCalls: 'KIR2DL1*001 KIR2DL1*002' with 'unresolved' /
        'failed' markers per gene column."""
        df = pd.read_csv(csv_file)
        out: dict[str, list[str]] = {}
        for _, row in df.iterrows():
            alleles: list[str] = []
            for gene, call in row.items():
                if gene == "name" or not isinstance(call, str):
                    continue
                for part in call.split(" ")[0].split("+"):
                    if part and "null" not in part and "failed" not in part:
                        alleles.append(part)
            out[str(row.get("name", ""))] = alleles
        return out

    def runAll(self, input_name: str) -> str:
        raise RuntimeError(
            "PING requires its repository + container and per-cohort CN "
            "threshold review; wire run()/readAllele() into your cohort "
            "layout (see reference kir/ping.py)"
        )


class SakaueKirTool(ContainerTool):
    """Sakaue et al. pipeline: bwa -> picard -> GATK ploidy -> HaplotypeCaller."""

    name = "sakauekir"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.images = {
            "bwa": "quay.io/biocontainers/bwa:0.7.17-hed695b0_7",
            "picard": "quay.io/biocontainers/picard:2.27.3--hdfd78af_0",
            "gatk3": "docker.io/broadinstitute/gatk3:3.6-0",
            "gatk4": "docker.io/broadinstitute/gatk:4.2.6.1",
            "deepvariant": "docker.io/google/deepvariant:1.4.0",
        }

    def runAll(self, input_name: str) -> str:
        raise RuntimeError(
            "SakaueKir needs GATK/picard/DeepVariant containers and the "
            "published reference panel; see reference kir/sakauekir.py"
        )


class KpiTool(ContainerTool):
    """KPI k-mer haplotype caller (nextflow container)."""

    name = "kpi"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.images = {"kpi": "docker.io/droeatumn/kpi"}

    def run(self, input_name: str) -> str:
        self._requireEngine()
        output_name = input_name + ".kpi"
        self.runDocker("kpi", f"main.nf --map {input_name}.txt --output {output_name}")
        return output_name

    def runAll(self, input_name: str) -> str:
        raise RuntimeError(
            "KPI needs its nextflow container; see reference kir/kpi.py"
        )


EXTERNAL_TOOLS = {
    T1kTool.name: T1kTool,
    PingTool.name: PingTool,
    SakaueKirTool.name: SakaueKirTool,
    KpiTool.name: KpiTool,
}
