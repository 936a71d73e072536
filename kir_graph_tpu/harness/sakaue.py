"""
Sakaue et al. KIR pipeline adapter (reference kir/sakauekir.py,
kir/sakauekir_cn.py, kir/sakauekir_call.py; upstream
github.com/saorisakaue/KIR_project).

Stage flow mirrors the published pipeline: bwa mem -> picard read-group +
MarkDuplicates -> GATK3 DiagnoseTargets depth -> KDE ploidy per gene ->
per-gene HaplotypeCaller at that ploidy -> joint genotyping -> dosage
genotype calling against the panel's allele-defining SNP table.

Container commands are gated behind an engine; everything that is plain
computation — the DiagnoseTargets VCF depth parse, the KDE ploidy model
(sakauekir_cn.py:8-58), and the dosage genotype caller
(sakauekir_call.py) — is implemented natively below and unit-tested on
canned outputs (tests/test_harness_adapters.py).
"""
from __future__ import annotations

import gzip
import json
import os
from itertools import combinations_with_replacement
from pathlib import Path

import numpy as np
import pandas as pd

from ..utils import logger
from .external import ContainerTool

# the panel's contig names (some genes share one contig) and the reference
# allele per contig — fixed constants of the published panel
# (sakauekir_call.py:25-28)
PANEL_GENES = [
    "KIR2DL1", "KIR2DL2", "KIR2DL3", "KIR2DL5A;KIR2DL5B", "KIR2DS1",
    "KIR2DS2", "KIR2DS3;KIR2DS5", "KIR2DS4", "KIR3DL1", "KIR3DL2",
    "KIR3DL3", "KIR3DS1", "KIR2DL4",
]

PLOIDY_GENELIST = [
    "KIR3DS1", "KIR3DL1", "KIR2DS4", "KIR2DS3;KIR2DS5", "KIR2DS2",
    "KIR2DS1", "KIR2DP1", "KIR2DL5A;KIR2DL5B", "KIR2DL3", "KIR2DL2",
    "KIR2DL1", "KIR3DL3", "KIR3DL2", "KIR2DL4",
]


# ---------------------------------------------------------------------------
# ploidy model (reference sakauekir_cn.py)

def gaussianKdeLogDensity(
    samples: np.ndarray, grid: np.ndarray, bandwidth: float = 0.075
) -> np.ndarray:
    """log sum of gaussian kernels — sklearn KernelDensity.score_samples."""
    d = (grid[:, None] - samples[None, :]) / bandwidth
    log_k = -0.5 * d * d - 0.5 * np.log(2 * np.pi) - np.log(bandwidth)
    m = log_k.max(axis=1, keepdims=True)
    return (
        m[:, 0] + np.log(np.exp(log_k - m).sum(axis=1)) - np.log(len(samples))
    )


def _strictLocalMinima(e: np.ndarray) -> np.ndarray:
    """Indices of strict local minima, boundary excluded (the behavior of
    scipy argrelextrema(np.less) in sakauekir_cn.py:18)."""
    if len(e) < 3:
        return np.array([], dtype=int)
    inner = np.arange(1, len(e) - 1)
    mask = (e[inner] < e[inner - 1]) & (e[inner] < e[inner + 1])
    return inner[mask]


def calcPloidyThresholds(
    cov: pd.DataFrame, bandwidth: float = 0.075, num: int = 50
) -> dict[str, np.ndarray]:
    """Per-gene CN cut points: KDE over the cohort's 3DL3-normalised depth
    ratios, thresholds at the density's local minima."""
    thresholds: dict[str, np.ndarray] = {}
    for gene, row in cov.iterrows():
        a = np.asarray(row, dtype=float)
        grid = np.linspace(a.min() - 0.05, a.max() + 0.05, num)
        e = gaussianKdeLogDensity(a, grid, bandwidth)
        mi = _strictLocalMinima(e)
        if not len(mi):
            logger.info(f"[SakaueKir] {gene} had zero threshold")
        thresholds[str(gene)] = grid[mi]
    return thresholds


def calcPloidy(
    cov: pd.DataFrame, thresholds: dict[str, np.ndarray]
) -> pd.DataFrame:
    """Bin each sample's ratio into CN classes by the gene's cut points."""
    genelist = [g for g in PLOIDY_GENELIST if g in cov.index]
    out = pd.DataFrame(np.nan, index=genelist, columns=cov.columns)
    for gene in genelist:
        cuts = np.hstack(([0.0], np.ravel(thresholds.get(gene, [])), [4.0]))
        # ratios <= 0 fall outside the first (0, x] bin -> NaN; the caller
        # fills those with CN 0 (reference sakauekir.py:169-171)
        out.loc[gene, :] = np.array(
            pd.cut(cov.loc[gene, :], cuts, labels=False), dtype=float
        )
    return out


def getPloidy(cov: pd.DataFrame) -> pd.DataFrame:
    return calcPloidy(cov, calcPloidyThresholds(cov))


# ---------------------------------------------------------------------------
# dosage genotype caller (reference sakauekir_call.py)

def parseDifpos(path: str) -> tuple[list[str], dict[tuple, list[str]]]:
    """Allele-defining SNP table -> (allele names, {(pos,ref,alt): doses})."""
    header: list[str] = []
    table: dict[tuple, list[str]] = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                header = line.rstrip().split("\t")
                continue
            cols = line.rstrip().split("\t")
            table[(cols[0], cols[1], cols[2])] = cols[3:]
    return header[3:], table


def parseGvcfDosages(
    path: str, gene: str
) -> tuple[dict[tuple, int], int]:
    """Sample variant dosages for `gene` from a (joint) gVCF.

    Returns ({(pos,ref,alt): summed genotype dosage}, ploidy).  LowQual
    rows and missing genotypes are skipped (sakauekir_call.py:50-66).
    """
    dosages: dict[tuple, int] = {}
    ploidy = 2
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        for line in f:
            if line.startswith("#"):
                continue
            cols = line.rstrip().split("\t")
            if cols[0] != gene or cols[6] == "LowQual":
                continue
            gt = cols[9].split(":")[0].split("/")
            ploidy = len(gt)
            if "." in gt:
                continue
            dosages[(cols[1], cols[3], cols[4])] = sum(int(g) for g in gt)
    return dosages, ploidy


def intersectPanelVariants(
    vcf_dosages: dict[tuple, int], panel: dict[tuple, list[str]]
) -> tuple[list[tuple], dict[tuple, str], dict[tuple, int]]:
    """Match VCF variants onto the panel table.

    A VCF variant can hit the panel directly (SAME), with ref/alt swapped
    (OPP), or as a reference-block row (`<NON_REF>` / `.` alt) anchored at
    a panel position (mapped onto the panel's alt or ref respectively) —
    sakauekir_call.py:80-99.
    """
    common: list[tuple] = []
    flags: dict[tuple, str] = {}
    dosage: dict[tuple, int] = dict(vcf_dosages)
    panel_keys = list(panel)
    for var, dose in vcf_dosages.items():
        pos, ref, alt = var
        if var in panel:
            common.append(var)
            flags[var] = "SAME"
            continue
        for ppos, pref, palt in panel_keys:
            if pos != ppos:
                continue
            if ref == palt and alt == pref:
                common.append(var)
                flags[var] = "OPP"
            elif ref == pref and alt in ("<NON_REF>", "."):
                new = (pos, ref, palt)
                common.append(new)
                flags[new] = "SAME"
                dosage[new] = dose
            elif ref == palt and alt in ("<NON_REF>", "."):
                new = (pos, ref, pref)
                common.append(new)
                flags[new] = "OPP"
                dosage[new] = dose
    return common, flags, dosage


def callGenotype(
    vcf_path: str,
    difpos_path: str,
    gene: str,
    sample: str,
    dosage_out: str = "",
    reference_out: str = "",
) -> tuple[str, str]:
    """-> (called genotype text, 'known' | 'potentially_novel')."""
    allele_names, panel = parseDifpos(difpos_path)
    vcf_dosages, ploidy = parseGvcfDosages(vcf_path, gene)
    common, flags, dosage = intersectPanelVariants(vcf_dosages, panel)

    if dosage_out:
        with open(dosage_out, "w") as f:
            print(f"#GENE\tPOS\tREF\tALT\t{sample}", file=f)
            for var in common:
                print(gene, *var, dosage[var], sep="\t", file=f)
    if reference_out:
        with open(reference_out, "w") as f:
            print("#POS\tREF\tALT\tFLIP\t" + "\t".join(allele_names), file=f)
            for var in common:
                if flags[var] == "SAME":
                    doses = panel[var]
                    print(*var, 0, *doses, sep="\t", file=f)
                else:
                    doses = panel[(var[0], var[2], var[1])]
                    flipped = [{"0": "1", "1": "0"}[d] for d in doses]
                    print(var[0], var[2], var[1], 1, *flipped, sep="\t", file=f)

    # per-allele dose vectors over the matched variants (OPP rows flipped)
    vecs: dict[str, np.ndarray] = {}
    rows = []
    for var in common:
        if flags[var] == "SAME":
            rows.append([int(d) for d in panel[var]])
        else:
            rows.append([1 - int(d) for d in panel[(var[0], var[2], var[1])]])
    mat = np.array(rows, dtype=int)  # [V, A]
    for i, name in enumerate(allele_names):
        vecs[name] = mat[:, i] if len(rows) else np.array([], dtype=int)

    # collapse alleles with identical dose vectors -> 'A-B' ambiguity names
    uniq: dict[str, np.ndarray] = {}
    for name, v in vecs.items():
        for key in list(uniq):
            if np.array_equal(uniq[key], v):
                uniq[key + "-" + name] = uniq.pop(key)
                break
        else:
            uniq[name] = v

    # all ploidy-sized multisets; collapse identical summed doses -> '-or-'
    combo_by_dose: dict[tuple, list[str]] = {}
    for combo in combinations_with_replacement(sorted(uniq), ploidy):
        dose = tuple(np.sum([uniq[c] for c in combo], axis=0))
        combo_by_dose.setdefault(dose, []).append("/".join(combo))

    sample_dose = np.array([dosage[v] for v in common], dtype=float)
    best_names, best_score = [], None
    for dose, names in combo_by_dose.items():
        diff = float(np.abs(sample_dose - np.array(dose)).sum())
        if np.allclose(sample_dose, np.array(dose)):
            return "-or-".join(names), "known"
        if best_score is None or diff < best_score:
            best_names, best_score = ["-or-".join(names)], diff
        elif diff == best_score:
            best_names.append("-or-".join(names))
    return (
        f"Close_to_{'-OR-'.join(best_names)}[score={best_score}]",
        "potentially_novel",
    )


# ---------------------------------------------------------------------------

class SakaueKirTool(ContainerTool):
    """Sakaue pipeline: bwa -> picard -> GATK ploidy -> per-gene calling."""

    name = "sakauekir"

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self.version = "v1.0.0"
        self.images = {
            "bwa": "quay.io/biocontainers/bwa:0.7.17--hed695b0_7",
            "gatk3": "docker.io/broadinstitute/gatk3:3.6-0",
            "picard": "quay.io/biocontainers/picard:2.27.3--hdfd78af_0",
            "samtools": "quay.io/biocontainers/samtools:1.15.1--h1170115_0",
            "deepvariant": "docker.io/google/deepvariant:1.4.0",
        }

    # -- container stages ---------------------------------------------------
    def download(self, folder_base: str = "") -> str:
        folder = os.path.join(
            folder_base or ".", "sakauekir_" + self.escapeName(self.version)
        )
        if Path(folder).exists():
            return folder
        raise RuntimeError(
            f"SakaueKir panel not found at {folder}; this build is offline — "
            "clone github.com/saorisakaue/KIR_project there first"
        )

    def bwa(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = input_name + "." + self.escapeName(index) + ".bwa"
        if Path(output_name + ".bam").exists():
            return output_name
        f1, f2 = f"{input_name}.read.1.fq.gz", f"{input_name}.read.2.fq.gz"
        if not Path(f1).exists():
            f1, f2 = f"{input_name}.read.1.fq", f"{input_name}.read.2.fq"
        name_id = self.getID(input_name)
        rg = f"@RG\\tID:{name_id}\\tSM:{name_id}"
        self.runDocker(
            "bwa",
            f"bwa mem -t {self.getThreads()} {index}/REF/KIR_seq_ref "
            f'-R "{rg}" {f1} {f2} -o {output_name}.sam',
        )
        self.runDocker(
            "samtools",
            f"samtools sort {output_name}.sam -o {output_name}.bam",
        )
        return output_name

    def addGroup(self, input_name: str) -> str:
        self._requireEngine()
        output_name = input_name + ".rg"
        if Path(output_name + ".bam").exists():
            return output_name
        name_id = self.getID(input_name)
        self.runDocker(
            "picard",
            f"picard AddOrReplaceReadGroups I={input_name}.bam "
            f"O={output_name}.bam RGLB={name_id} RGPL=ILLUMINA "
            f"RGPU={name_id} RGSM={name_id} RGID={name_id} "
            "VALIDATION_STRINGENCY=LENIENT",
        )
        return output_name

    def markDuplicate(self, input_name: str) -> str:
        self._requireEngine()
        output_name = input_name + ".md"
        if Path(output_name + ".bam").exists():
            return output_name
        self.runDocker(
            "picard",
            f"picard MarkDuplicates I={input_name}.bam O={output_name}.bam "
            "ASSUME_SORTED=false REMOVE_DUPLICATES=false CREATE_INDEX=True "
            f"VALIDATION_STRINGENCY=LENIENT M={output_name}.metrics",
        )
        return output_name

    def analysisTK(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = input_name + ".coverage"
        if Path(output_name + ".vcf").exists():
            return output_name
        self.runDocker(
            "gatk3",
            "java -jar /usr/GenomeAnalysisTK.jar -T DiagnoseTargets "
            f"-I {input_name}.bam -o {output_name}.vcf "
            f"-R {index}/REF/KIR_seq_ref.fasta "
            f"-L {index}/REF/KIR_seq_ref.intervals",
        )
        return output_name

    # -- native computation stages ------------------------------------------
    def getCoverage(self, input_name: str) -> str:
        """DiagnoseTargets VCF -> per-gene length-weighted mean depth."""
        output_name = input_name + ".depth"
        if Path(output_name + ".csv").exists():
            return output_name
        rows = []
        with open(input_name + ".vcf") as f:
            for line in f:
                if not line.strip() or line.startswith("#"):
                    continue
                cols = line.split("\t")
                info = dict(kv.split("=") for kv in cols[7].split(";"))
                rows.append({
                    "gene": cols[0],
                    "depth": float(info["IDP"]),
                    "length": float(info["END"]) - float(cols[1]),
                })
        df = pd.DataFrame(rows)
        out = df.groupby("gene").apply(
            lambda g: np.average(g.depth, weights=g.length)
        ).reset_index()
        out.to_csv(output_name + ".csv", index=False, header=None)
        return output_name

    def ploidyEstimate(self, input_name: str) -> str:
        """Cohort depth csvs -> 3DL3-normalised ratios -> KDE ploidy."""
        output_base = self.replaceWildcard(input_name, "_merge_depth")
        output_name = output_base + ".ploidy"
        if Path(output_name + ".csv").exists():
            return output_name
        dfs = []
        for name in self.listFiles(input_name):
            df = pd.read_csv(name + ".csv", header=None, index_col=0)
            dfs.append(df.set_axis([self.getID(name)], axis=1))
        cov = pd.concat(dfs, axis=1)
        cov = cov / cov.loc["KIR3DL3", :]
        ploidy = getPloidy(cov)
        ploidy.loc["KIR3DL3", :] = 2
        ploidy = ploidy.fillna(0).astype(int)
        ploidy.to_csv(output_name + ".csv")
        return output_name

    def renameGene(self, gene: str) -> str:
        return {
            "KIR2DL5A;KIR2DL5B": "KIR2DL5AB",
            "KIR2DS3;KIR2DS5": "KIR2DS35",
        }.get(gene, gene)

    def beforeHC(self, input_name: str, ploidy_name: str) -> str:
        name_id = self.getID(input_name)
        output_name = (
            input_name + ".ploidy_"
            + self.escapeName(ploidy_name.format("same")) + ".gene.{}"
        )
        if Path(output_name.format("KIR3DL3") + ".json").exists():
            return output_name
        ploidy = pd.read_csv(ploidy_name.format(name_id) + ".csv", index_col=0)
        for gene, p in ploidy[name_id].items():
            if not p or gene == "KIR3DP1":
                continue
            with open(output_name.format(self.renameGene(str(gene))) + ".json",
                      "w") as f:
                json.dump({
                    "id": name_id, "gene": gene, "input_name": input_name,
                    "bam": input_name + ".bam", "ploidy": int(p),
                }, f)
        return output_name

    def haplotypeCaller(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = input_name + ".hc"
        if Path(output_name + ".g.vcf.gz").exists():
            return output_name
        with open(input_name + ".json") as f:
            data = json.load(f)
        self.runDocker(
            "gatk3",
            "java -jar /usr/GenomeAnalysisTK.jar -T HaplotypeCaller "
            f"-I {data['bam']} -o {output_name}.g.vcf.gz -nct 2 "
            f"-ploidy {data['ploidy']} -R {index}/REF/KIR_seq_ref.fasta "
            f"-L '{index}/REF/{self.renameGene(data['gene'])}.intervals' "
            "--emitRefConfidence GVCF",
        )
        return output_name

    def jointGenotype(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = self.replaceWildcard(input_name, "_mergevcf") + ".gt"
        if Path(output_name + ".g.vcf.gz").exists():
            return output_name
        variants = " ".join(
            "--variant " + n + ".g.vcf.gz" for n in self.listFiles(input_name)
        )
        self.runDocker(
            "gatk3",
            "java -jar /usr/GenomeAnalysisTK.jar -T GenotypeGVCFs "
            f"-R {index}/REF/KIR_seq_ref.fasta -allSites "
            f"-o {output_name}.g.vcf.gz {variants}",
        )
        return output_name

    def deepVariant(self, input_name: str, index: str) -> str:
        self._requireEngine()
        output_name = input_name + ".dv"
        if Path(output_name + ".g.vcf.gz").exists():
            return output_name
        self.runDocker(
            "deepvariant",
            "/opt/deepvariant/bin/run_deepvariant --model_type=WGS "
            f"--ref {index}/REF/KIR_seq_ref.fasta --reads {input_name}.bam "
            f"--output_vcf={output_name}.vcf.gz "
            f"--output_gvcf={output_name}.g.vcf.gz",
        )
        return output_name

    def beforeCalling(self, input_name: str) -> str:
        output_name = input_name + ".genecall.{}"
        if Path(output_name.format("KIR2DL4") + ".json").exists():
            return output_name
        for gene in sorted(set(PANEL_GENES)):
            with open(output_name.format(self.renameGene(gene)) + ".json",
                      "w") as f:
                json.dump({
                    "input_name": input_name,
                    "vcf": input_name + ".g.vcf.gz",
                    "gene": gene,
                }, f)
        return output_name

    def calling(self, input_name: str, index: str) -> str:
        """Native dosage genotype calling (replaces the reference's
        subprocess to sakauekir_call.py)."""
        output_name = input_name
        if Path(output_name + ".alleles.tsv").exists():
            return output_name + ".alleles"
        with open(input_name + ".json") as f:
            data = json.load(f)
        # sample id from the joint gVCF header
        sample = ""
        with gzip.open(data["vcf"], "rt") as f:
            for line in f:
                if line.startswith("#CHROM"):
                    sample = line.split("FORMAT")[-1].split()[0].strip()
                    break
        assert sample
        genotype, flag = callGenotype(
            data["vcf"],
            os.path.join(index, "data", f"{data['gene']}.difpos.all.txt"),
            data["gene"],
            sample,
            dosage_out=output_name + ".dosage.tsv",
            reference_out=output_name + ".reference.tsv",
        )
        with open(output_name + ".alleles.tsv", "w") as f:
            print(sample, data["gene"], genotype, flag, sep="\t", file=f)
        return output_name + ".alleles"

    def mergeCalling(self, input_name: str) -> str:
        output_name = self.replaceWildcard(input_name, "_merge")
        if Path(output_name + ".tsv").exists():
            return output_name
        with open(output_name + ".tsv", "w") as out:
            for name in self.listFiles(input_name):
                with open(name + ".tsv") as f:
                    out.write(f.read())
        return output_name

    # -- result normalisation ----------------------------------------------
    @staticmethod
    def readResult(filename: str, select_all: bool = False) -> tuple[str, list[str]]:
        """alleles.tsv -> (sample id, allele list); ambiguity groups keep
        the first member unless select_all (sakauekir.py:344-376)."""
        df = pd.read_csv(filename, header=None, sep="\t", dtype=str)
        df.columns = ["id", "gene", "alleles", "type"]
        alleles: list[str] = []
        name_id = ""
        for row in df.itertuples():
            name_id = str(row.id)
            if row.type == "known":
                possible = row.alleles.replace("_", "*").split("-or-")
            elif row.type == "potentially_novel":
                text = (
                    row.alleles.replace("Close_to_", "")
                    .replace("_", "*").split("[")[0]
                )
                possible = text.split("-OR-")
            else:
                raise ValueError(f"{row.type} type not found")
            if select_all:
                alleles.extend(
                    k for p in possible for j in p.split("/") for k in j.split("-")
                )
            else:
                alleles.extend(p.split("-")[0] for p in possible[0].split("/"))
        return name_id, alleles

    def mergeResult(self, input_name: str, select_all: bool = False) -> str:
        suffix = "_merge_called_full" if select_all else "_merge_called"
        output_name = self.replaceWildcard(input_name, suffix)
        predict_list = []
        for name in self.listFiles(input_name):
            name_id, alleles = self.readResult(name + ".tsv", select_all)
            predict_list.append({
                "id": name_id, "alleles": alleles,
                "name": input_name.format(name_id),
            })
        self.savePredictedAllele(predict_list, output_name)
        return output_name

    # -----------------------------------------------------------------------
    def runAll(self, input_name: str) -> str:
        folder = self.download()
        sample_bam = []
        for sample in self.listFiles(input_name):
            sample = self.bwa(sample, index=folder)
            sample = self.addGroup(sample)
            sample = self.markDuplicate(sample)
            sample_bam.append(sample)
            sample = self.analysisTK(sample, index=folder)
            self.getCoverage(sample)

        samples = input_name + f".{self.escapeName(folder)}.bwa.rg.md"
        samples_cn = self.ploidyEstimate(samples + ".coverage.depth")
        merged = []
        for sample in sample_bam:
            samples_gene = self.beforeHC(sample, samples_cn)
            for gene_job in self.listFiles(samples_gene):
                self.haplotypeCaller(gene_job, index=folder)
            joint = self.jointGenotype(samples_gene + ".hc", index=folder)
            samples_call = self.beforeCalling(joint)
            for gene_job in self.listFiles(samples_call):
                self.calling(gene_job, index=folder)
            merged.append(self.mergeCalling(samples_call + ".alleles"))
        assert merged
        output_name = self.replaceWildcard(input_name, "_sakauekir_merge_called")
        predict_list = []
        for merged_name in merged:
            name_id, alleles = self.readResult(merged_name + ".tsv")
            predict_list.append({
                "id": name_id, "alleles": alleles, "name": merged_name,
            })
        self.savePredictedAllele(predict_list, output_name)
        return output_name
