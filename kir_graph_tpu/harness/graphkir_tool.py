"""
GraphKir adapter: runs THIS framework over a sample wildcard
(the reference's kir/graphkir.py shells out to the graphkir CLI; here the
pipeline runs in-process — no subprocess, no container).
"""
from __future__ import annotations

import os

import pandas as pd

from ..pipeline.main import createParser, main as pipelineMain
from ..utils import logger
from .pipe import KirPipe


class GraphKirTool(KirPipe):
    name = "graphkir"

    def __init__(self, index_prefix: str = "", **kwargs):
        super().__init__(**kwargs)
        self.index_prefix = index_prefix

    def run(self, input_name: str, allele_strategy: str = "exonfirst") -> str:
        """Align+type every sample matching `input_name` (`{}` wildcard)."""
        names = self.listFiles(input_name)
        assert names, f"no samples match {input_name}"
        samples = []
        for name in names:
            r1 = f"{name}.read.1.fq.gz"
            r2 = f"{name}.read.2.fq.gz"
            if not os.path.exists(r1):
                r1, r2 = f"{name}.read1.fq.gz", f"{name}.read2.fq.gz"
            samples.append({"name": name, "r1": r1, "r2": r2})
        cohort_csv = self.replaceWildcard(input_name, "_graphkir_cohort") + ".csv"
        pd.DataFrame(samples).to_csv(cohort_csv, index=False)

        cohort_name = self.replaceWildcard(input_name, "_graphkir_merge")
        args = createParser().parse_args(
            [
                "--thread", str(self.getThreads()),
                "--input-csv", cohort_csv,
                "--index-prefix", self.index_prefix,
                "--allele-strategy", allele_strategy,
                "--output-cohort-name", cohort_name,
            ]
        )
        pipelineMain(args)
        return cohort_name + ".allele"

    def readResult(self, cohort_name: str) -> pd.DataFrame:
        return pd.read_csv(cohort_name + ".tsv", sep="\t")

    def runAll(self, input_name: str) -> str:
        logger.info(f"[graphkir] run {input_name}")
        merged = self.run(input_name)
        # re-key rows by sample id for the comparison table
        df = self.readResult(merged)
        out = []
        for _, row in df.iterrows():
            out.append(
                {
                    "id": self.getID(str(row["name"])),
                    "alleles": str(row["alleles"]).split("_"),
                    "name": row["name"],
                }
            )
        final = self.replaceWildcard(input_name, "_graphkir_final")
        self.savePredictedAllele(out, final)
        return final
