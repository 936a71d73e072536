"""
Real-WGS cohort orchestrator (reference research/kg_real.py).

Replays the reference's real-data flow — link a cohort of WGS samples
(HPRC/TWBB-style CSV), pull KIR-region reads out of each genome, run the
graph pipeline (map -> variants -> depth -> CN -> typing), and score the
calls against a possible-answer summary — without the namepipe/SLURM/bwa
machinery: sample linking is a CSV (kg_real.py:44-60 linkHPRCSample),
extraction is the WGS linear-region aligner (wgs/extract.py replacing
bwa+samtools, kg_real.py:162-171), and the per-sample chain is
SamplePipeline (kg_real.py:203-233 extractVariant -> bam2Depth ->
cnPredict -> kirTyping -> mergeKirResult).  Evaluation mirrors
compareCNResult (kg_eval_cn) and the HPRC possible-answer comparison
(kg_real.py:221,233 via the kg_eval_hprc grammar).

Sample fan-out uses the concurrent task executor (the reference's
ConcurrentTaskExecutor(10), kg_real.py:183); every stage resumes off its
output file like the rest of the pipeline.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from pathlib import Path

import pandas as pd

from ..utils import logger, mergeAllele, mergeCN
from .main import resolveIndex


def createParser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Real-WGS KIR cohort run (HPRC/TWBB-style)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument(
        "--cohort-csv", required=True,
        help="CSV with columns id,r1,r2 (WGS FASTQ per sample; the "
        "hprc.csv sample table of kg_real.py:45) or id,bam (mapped BAM, "
        "TWBB-style kg_real.py:86-96 — converted via the builtin "
        "bam2fastq)",
    )
    parser.add_argument("--out", required=True, help="Output folder")
    parser.add_argument("--cohort", default="real", help="Cohort tag")
    parser.add_argument("--index-prefix")
    parser.add_argument("--msa-prefix")
    parser.add_argument("--ipd-db")
    parser.add_argument("--msa-type", default="ab_2dl1s1")
    parser.add_argument("--ipd-version", default="2100")
    parser.add_argument("--msa-no-exon-only-allele", action="store_true")
    parser.add_argument(
        "--genome", default="",
        help="Local genome FASTA; enables the WGS extraction stage",
    )
    parser.add_argument("--ref-genome", default="hg19", choices=["hg19", "hg38"])
    parser.add_argument(
        "--direct-on-kir", action="store_true",
        help="Reads are already KIR-region-only: skip extraction "
        "(kg_real.py:115 direct_on_kir)",
    )
    parser.add_argument(
        "--diploid-gene", default="", choices=["", "VDR", "RYR1", "EGFR"],
        help="Diploid gene for CN depth normalisation during extraction",
    )
    parser.add_argument("--cn-select", default="p75")
    parser.add_argument("--cn-algorithm", default="CNgroup")
    parser.add_argument(
        "--cn-cohort", action="store_true", help="Fit one CN model cohort-wide"
    )
    parser.add_argument(
        "--allele-method", default="exonfirst_1",
        help="Typing strategy (reference pv_exonfirst_1, kg_real.py:228)",
    )
    parser.add_argument("--allele-top-n", default=600, type=int)
    parser.add_argument(
        "--cn-truth", default="",
        help="CN truth TSV (gene x sample) for compareCNResult-style eval",
    )
    parser.add_argument(
        "--allele-truth", default="",
        help="HPRC possible-answer TSV (id<TAB>alleles '_'-joined) for the "
        "precision/recall grammar eval",
    )
    parser.add_argument("--threads", default=4, type=int)
    parser.add_argument("--log-level", default="INFO")
    return parser


def _sampleChain(
    pipe, wgs, name: str, fq1: str, fq2: str, args
) -> dict[str, str]:
    """One sample: [extract ->] map -> depth -> CN -> files dict."""
    diploid = ""
    if wgs is not None:
        from ..wgs.extract import extractKirReads

        out = name + ".extract"
        if not (os.path.exists(out + ".read.1.fq.gz")
                and os.path.exists(out + ".read.2.fq.gz")):
            fq1, fq2, diploid = extractKirReads(
                wgs, fq1, fq2, out,
                diploid_out=out + ".diploid" if args.diploid_gene else "",
            )
        else:
            fq1 = out + ".read.1.fq.gz"
            fq2 = out + ".read.2.fq.gz"
            if args.diploid_gene:
                diploid = out + ".diploid"
        name = out
    prefix = pipe.mapSample(name, fq1, fq2)
    pipe.flushWrites()  # depth/typing stages read the artifacts back
    depth = pipe.depthStage(prefix)
    return {"prefix": prefix, "depth": depth, "diploid": diploid}


def main(args: argparse.Namespace) -> dict:
    logging.basicConfig(level=args.log_level)
    logger.setLevel(args.log_level)
    Path(args.out).mkdir(parents=True, exist_ok=True)

    df = pd.read_csv(args.cohort_csv)
    ids = [str(i) for i in df["id"]]
    names = [str(Path(args.out) / f"{args.cohort}.{sid}") for sid in ids]
    logger.info(f"[Real] cohort {args.cohort}: {len(ids)} samples")

    pipe = resolveIndex(args)

    wgs = None
    if args.genome and not args.direct_on_kir:
        from ..wgs.extract import buildWgsIndex

        wgs = buildWgsIndex(
            args.genome, args.ref_genome, diploid_gene=args.diploid_gene
        )

    # --- per-sample fan-out: extract + map + depth
    from ..parallel.tasks import ConcurrentTaskExecutor, Task

    exe = ConcurrentTaskExecutor(threads=args.threads)
    chains: list[dict[str, str]] = [{} for _ in ids]

    def makeRunner(i: int, fq1: str, fq2: str):
        def run() -> str:
            chains[i] = _sampleChain(pipe, wgs, names[i], fq1, fq2, args)
            return chains[i]["prefix"]

        return run

    def sampleFastqs(i: int, row) -> tuple[str, str]:
        if "bam" in df.columns and isinstance(row.bam, str) and row.bam:
            from ..wgs.bam import bam2fastq

            out = names[i] + ".bam2fq"
            if os.path.exists(out + ".read.1.fq.gz"):
                return out + ".read.1.fq.gz", out + ".read.2.fq.gz"
            return bam2fastq(row.bam, out)
        return str(row.r1), str(row.r2)

    # Task.output is a prefix (never an existing file), so every sample's
    # chain closure runs; the chain's stages resume off their own files
    exe.run(
        [
            Task(output=names[i], fn=makeRunner(i, *sampleFastqs(i, r)))
            for i, r in enumerate(df.itertuples())
        ]
    )

    # --- copy number (per-sample with diploid normalisation, or cohort fit)
    if args.cn_cohort:
        from ..cn.predict import predictSamplesCN

        cn_files = [c["depth"][:-4] + ".cohort.cn.tsv" for c in chains]
        if not all(os.path.exists(f) for f in cn_files):
            predictSamplesCN(
                [c["depth"] for c in chains],
                cn_files,
                cluster_method=args.cn_algorithm,
                select_mode=args.cn_select,
                save_cn_model_path=str(
                    Path(args.out) / f"{args.cohort}.cn_model.json"
                ),
            )
    else:
        cn_files = [
            pipe.cnSample(
                c["depth"],
                cn_select=args.cn_select,
                cn_algorithm=args.cn_algorithm,
                diploid_depth=c["diploid"],
            )
            for c in chains
        ]

    # --- typing
    allele_files = [
        pipe.typeSample(
            c["prefix"], cnf, method=args.allele_method,
            top_n=args.allele_top_n,
        )
        for c, cnf in zip(chains, cn_files)
    ]

    cohort_prefix = str(Path(args.out) / args.cohort)
    mergeCN(cn_files, cohort_prefix + ".cn.tsv")
    allele_df = mergeAllele(allele_files, cohort_prefix + ".allele.tsv")
    logger.info(f"[Real] cohort tables: {cohort_prefix}.{{cn,allele}}.tsv")

    report: dict = {"samples": len(ids), "cohort": args.cohort}

    # --- evaluation vs truth
    predictions = {
        sid: str(row["alleles"]).split("_")
        for sid, (_, row) in zip(ids, allele_df.iterrows())
    }
    if args.allele_truth:
        from ..eval.hprc import evaluateHprc, readHprcTruth

        truth = readHprcTruth(args.allele_truth)
        table = evaluateHprc(truth, predictions)
        table.to_csv(cohort_prefix + ".hprc_eval.tsv", sep="\t", index=False)
        overall = table[table["gene"] == "ALL"]
        report["allele_eval"] = {
            int(r["digits"]): {"precision": float(r["precision"]),
                               "recall": float(r["recall"]),
                               "f1": float(r["f1"])}
            for _, r in overall.iterrows()
        }
        logger.info(f"[Real] allele eval:\n{overall}")
    if args.cn_truth:
        from ..eval.compare_cn import compareCNCohort

        ans_df = pd.read_csv(args.cn_truth, sep="\t", index_col=0)
        cohort_ans = {
            str(c): dict(ans_df[c].dropna().astype(int)) for c in ans_df.columns
        }
        pred_df = pd.read_csv(cohort_prefix + ".cn.tsv", sep="\t", index_col=0)
        # mergeCN's pivot columns are the per-sample cn FILE PATHS (sorted
        # lexicographically) — map each id through its own file, not by
        # column order
        cohort_pred = {
            sid: dict(pred_df[f].astype(int))
            for sid, f in zip(ids, cn_files)
        }
        diffs = compareCNCohort(cohort_ans, cohort_pred)
        diffs.to_csv(cohort_prefix + ".cn_eval.tsv", sep="\t", index=False)
        if len(diffs):
            report["cn_acc"] = float(
                1 - diffs["diff_abs"].sum() / max(diffs["total"].sum(), 1)
            )
    with open(cohort_prefix + ".real_report.json", "w") as f:
        json.dump(report, f, indent=1)
    return report


def entrypoint() -> None:
    main(createParser().parse_args())


if __name__ == "__main__":
    entrypoint()
