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
    """PING R pipeline (reference kir/ping.py; upstream
    github.com/wesleymarin/PING).  CN thresholding may require manual
    review of manualCopyNumberFrame.csv mid-run — the same caveat the
    reference documents (research/other_kir.py:414)."""

    name = "ping"

    def __init__(self, version: str = "20220527", **kwargs):
        super().__init__(**kwargs)
        self.version = version
        self.images = {"ping": f"localhost/c4lab/ping:{self.version}"}

    def download(self, folder_base: str = "") -> str:
        folder = os.path.join(
            folder_base or ".", "ping_" + self.escapeName(self.version)
        )
        if os.path.exists(folder):
            return folder
        raise RuntimeError(
            f"PING checkout not found at {folder}; this build is offline — "
            "clone github.com/wesleymarin/PING there first"
        )

    def migrateSample(self, input_name: str) -> str:
        """Symlink the cohort's FASTQs into one PING input directory with
        `id.{sample}` names (ping.py:67-82)."""
        folder = self.replaceWildcard(input_name, "_pingsample")
        if os.path.exists(folder):
            return folder
        os.makedirs(folder)
        depth = len([p for p in folder.split(os.sep) if p and p != "."])
        rel = os.path.join(*([".."] * depth)) if depth else "."
        for name in self.listFiles(input_name):
            f1, f2 = f"{name}.read.1.fq", f"{name}.read.2.fq"
            suffix = "fq"
            if not os.path.exists(f1):
                f1, f2 = f"{name}.read.1.fq.gz", f"{name}.read.2.fq.gz"
                suffix = "fq.gz"
            sid = self.getID(name)
            os.symlink(os.path.join(rel, f1),
                       os.path.join(folder, f"id.{sid}.read.1.{suffix}"))
            os.symlink(os.path.join(rel, f2),
                       os.path.join(folder, f"id.{sid}.read.2.{suffix}"))
        return folder

    def getOutputFolder(self, folder_in: str, index: str) -> str:
        return folder_in + ".result_" + self.escapeName(index)

    def main(self, folder_in: str, index: str) -> str:
        """Run PING_run.R over the migrated sample folder."""
        self._requireEngine()
        folder_out = self.getOutputFolder(folder_in, index)
        if os.path.exists(os.path.join(folder_out, "finalAlleleCalls.csv")):
            return folder_out
        self.runDocker(
            "ping",
            f"Rscript ping.run_{self.version}.R",
            opts=(
                # expanded here: the argv executor runs shell=False, so
                # a literal $PWD would reach docker unexpanded
                f" -v {os.getcwd()}/{index}/Resources:/app/Resources:ro"
                f" -e RAW_FASTQ_DIR={folder_in}"
                f" -e FASTQ_PATTERN=fq"
                f" -e THREADS={self.getThreads()}"
                f" -e RESULTS_DIR={folder_out}"
                f" -e SHORTNAME_DELIM=.read"
            ),
        )
        return folder_out

    @staticmethod
    def readAllele(csv_file: str) -> dict[str, list[str]]:
        """finalAlleleCalls.csv: per-gene 'A*001+A*002 <alt>' strings with
        'null'/'failed'/'unresolved' markers (ping.py:108-144)."""
        df = pd.read_csv(csv_file)
        if not isinstance(df.index, pd.RangeIndex):
            df = df.reset_index()
        df = df.rename(columns={"Unnamed: 0": "name", "index": "name"})
        df = df.fillna("")
        out: dict[str, list[str]] = {}
        for row in df.to_dict("records"):
            name_id = str(row["name"])
            if name_id.startswith("id."):
                name_id = name_id[3:]
            alleles: list[str] = []
            for gene, call in row.items():
                if gene == "name" or not isinstance(call, str):
                    continue
                for part in call.split(" ")[0].split("+"):
                    if part and "null" not in part and "failed" not in part:
                        alleles.append(part.replace("_", "."))
            out[name_id] = alleles
        return out

    def mergeResult(self, result_folder: str, use_novel: bool = False) -> str:
        output_name = result_folder + ".merge"
        if use_novel:
            output_name += "_iter"
            data = self.readAllele(
                os.path.join(result_folder, "iterAlleleCalls.csv"))
        else:
            output_name += "_final"
            data = self.readAllele(
                os.path.join(result_folder, "finalAlleleCalls.csv"))
        predict_list = [
            {"id": name, "alleles": alleles, "name": f"{result_folder}.{name}"}
            for name, alleles in data.items()
        ]
        self.savePredictedAllele(predict_list, output_name)
        return output_name

    @staticmethod
    def readGeneDepthRatio(locus_csv: str) -> pd.DataFrame:
        """PING locusRatioFrame.csv -> tidy depth-ratio table
        (ping.py:155-166)."""
        df = pd.read_csv(locus_csv)
        df = df.rename(columns={"Unnamed: 0": "sample"})
        df["method"] = "PING"
        df["id"] = [str(s)[3:] if str(s).startswith("id.") else str(s)
                    for s in df["sample"]]
        return df.drop(columns=["sample"])

    @staticmethod
    def calcThreshold(ans_values: list[float],
                      ping_values: list[float]) -> list[float]:
        """Cut CN thresholds on PING's gene-depth ratios from known answers.

        EACH list is sorted ascending independently (rank pairing):
        ``ans_values`` are the true half-CN values (CN/2 with 3DL3
        diploid), ``ping_values`` the measured depth ratios.  Each CN step
        gets a threshold at the midpoint between the last ratio of the
        lower class and the first ratio of the higher one (reference
        research/other_kir.py:414-436).  Lists are sorted here too, so a
        caller passing sample-paired (unsorted, hence possibly
        non-monotonic) values gets rank pairing rather than a hang.
        """
        ans_count = sorted(int(round(v * 2)) for v in ans_values)
        ping_sorted = sorted(ping_values)
        now_cn = 0
        prev_ratio = 0.0
        threshold: list[float] = []
        for ratio, cn in zip(ping_sorted, ans_count):
            while now_cn < cn:
                now_cn += 1
                threshold.append((prev_ratio + ratio) / 2)
            prev_ratio = ratio
        threshold.append(prev_ratio + 0.5)
        return threshold

    @staticmethod
    def readAnswerGeneCN(answer_tsv: str) -> pd.DataFrame:
        """True per-gene half-CN table from a cohort answer file
        (reference research/other_kir.py:332-350: CN relative to diploid
        3DL3, 2DL5A/B pooled by the 7-char gene prefix)."""
        from ..eval.compare import readAnswerAllele

        rows = []
        for sid, alleles in readAnswerAllele(answer_tsv).items():
            counts: dict[str, float] = {}
            for allele in alleles:
                gene = allele[:7]
                counts[gene] = counts.get(gene, 0.0) + 0.5
            rows.append({**counts, "id": sid, "method": "ANS"})
        return pd.DataFrame(rows).fillna(0)

    def predictCNByAnswer(self, folder_out: str, answer_tsv: str,
                          save: bool = True) -> pd.DataFrame:
        """Auto-derive manualCopyThresholds.csv from a truth cohort so
        PING's interactive CN review step can be skipped (reference
        research/other_kir.py:282-330)."""
        df_ping = self.readGeneDepthRatio(
            os.path.join(folder_out, "locusRatioFrame.csv"))
        df_ans = self.readAnswerGeneCN(answer_tsv)
        df = pd.concat([df_ping, df_ans], ignore_index=True)
        df = df.melt(["id", "method"], var_name="gene").dropna()
        df = df.sort_values(["method", "value"], ascending=[False, True])
        shared = set(df[df["method"] == "PING"]["id"]) & set(
            df[df["method"] == "ANS"]["id"])
        skipped = set(df["id"]) - shared
        if skipped:
            logger.warning("[ping] no answer/ratio for samples %s", skipped)
        df = df[df["id"].isin(shared)]

        rows = []
        for gene in sorted(set(df["gene"])):
            part = df[df["gene"] == gene]
            ans = part[part["method"] == "ANS"]
            ping = part[part["method"] == "PING"]
            # rank pairing needs the SAME sample set on both sides: a
            # per-gene NaN (PING failed the locus) must drop the sample
            # from both lists, not shift every rank after it
            ids = set(ans["id"]) & set(ping["id"])
            ans = ans[ans["id"].isin(ids)]
            ping = ping[ping["id"].isin(ids)]
            if not len(ans) or len(ans) != len(ping):
                continue
            cuts = self.calcThreshold(list(ans["value"]), list(ping["value"]))
            rows.append({"gene": gene,
                         **{f"{i}-{i + 1}": c for i, c in enumerate(cuts)}})
        if not rows:
            logger.warning("[ping] no gene had answer+ratio data; "
                           "empty threshold table")
            return pd.DataFrame(
                columns=["gene"] + [f"{i}-{i + 1}" for i in range(6)])
        out = pd.DataFrame(rows)
        out = out[out["gene"] != "KIR3DL3"]
        out = out.reindex(columns=["gene"] + [f"{i}-{i + 1}" for i in range(6)])
        out = out.fillna("NA")
        if save:
            out.to_csv(os.path.join(folder_out, "manualCopyThresholds.csv"),
                       index=False)
        return out

    def runAll(self, input_name: str) -> str:
        index = self.download()
        folder = self.migrateSample(input_name)
        result = self.main(folder, index=index)
        return self.mergeResult(result)


class KpiTool(ContainerTool):
    """KPI k-mer haplotype caller (reference kir/kpi.py; upstream
    github.com/droeatumn/kpi)."""

    name = "kpi"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.version = "v1.1.1"
        self.images = {"kpi": "docker.io/droeatumn/kpi"}

    def download(self, folder_base: str = "") -> str:
        folder = os.path.join(
            folder_base or ".", "kpi_" + self.escapeName(self.version)
        )
        if os.path.exists(folder):
            return folder
        raise RuntimeError(
            f"KPI checkout not found at {folder}; this build is offline — "
            "clone github.com/droeatumn/kpi there first"
        )

    def run(self, input_name: str, index: str) -> str:
        """Write the nextflow mapping file and run KPI (kpi.py:35-56)."""
        mapping_file = self.replaceWildcard(input_name, "_kpidatalist")
        out_suffix = ".kpi_" + self.escapeName(index)
        output_name = input_name + out_suffix + "_prediction"
        if os.path.exists(mapping_file + ".txt"):
            return output_name
        with open(mapping_file + ".txt", "w") as f:
            for name in self.listFiles(input_name):
                f1, f2 = f"{name}.read.1.fq", f"{name}.read.2.fq"
                if not os.path.exists(f1):
                    f1, f2 = f"{name}.read.1.fq.gz", f"{name}.read.2.fq.gz"
                base = os.path.basename(name)
                print(base + out_suffix, f1, sep="\t", file=f)
                print(base + out_suffix, f2, sep="\t", file=f)
        self._requireEngine()
        folder = os.path.dirname(input_name) or "."
        self.runDocker(
            "kpi", f"/opt/kpi/main.nf --map {mapping_file}.txt --output {folder}"
        )
        return output_name

    def mergeResult(self, input_name: str, index: str) -> str:
        """KPI haplotype strings -> per-gene CN + pseudo-allele table
        (kpi.py:58-105): take the first haplotype interpretation, sum the
        haplotype table's per-gene presence columns."""
        haps = pd.read_csv(os.path.join(index, "input", "haps.txt"), sep="\t")
        output_name_cn = self.replaceWildcard(input_name, "_merge_cn")
        output_name = self.replaceWildcard(input_name, "_merge_guess_allele")

        cn: dict[str, dict[str, int]] = {}
        guess_allele = []
        for name in self.listFiles(input_name):
            df = pd.read_csv(name + ".txt", sep="\t")
            haplo = str(df["haplotypes"][0]).split("|")[0]
            sel = haps[haps["nomenclature"].isin(haplo.split("+"))]
            sel = sel.drop(columns=[
                c for c in
                ("haplotype", "nomenclature", "Jiang 2012 freq", "structure")
                if c in sel.columns
            ])
            sel = sel.set_axis([f"KIR{c}" for c in sel.columns], axis=1)
            name_id = self.getID(name)
            cn[name_id] = {g: int(v) for g, v in sel.sum(axis=0).items()}
            alleles = [
                g for g, c in cn[name_id].items() for _ in range(c)
            ]
            guess_allele.append(
                {"id": name_id, "alleles": alleles, "name": name}
            )
        assert cn
        df_cn = pd.DataFrame(cn).reset_index().rename(columns={"index": "gene"})
        df_cn.to_csv(output_name_cn + ".csv", index=False)
        self.savePredictedAllele(guess_allele, output_name)
        return output_name

    def runAll(self, input_name: str) -> str:
        index = self.download()
        samples = self.run(input_name, index=index)
        return self.mergeResult(samples, index=index)


from .sakaue import SakaueKirTool  # noqa: E402  (needs ContainerTool above)

EXTERNAL_TOOLS = {
    T1kTool.name: T1kTool,
    PingTool.name: PingTool,
    SakaueKirTool.name: SakaueKirTool,
    KpiTool.name: KpiTool,
}
