"""
Research orchestrator: simulated cohort -> pipeline -> accuracy report
(the reference's research/kg_main.py loop, SURVEY §3.4, without namepipe —
stages resume by filename exactly like the product CLI).

    python -m kir_graph_tpu.pipeline.research --out /tmp/kirsim --samples 10
"""
from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import pandas as pd

from ..eval import calcSummaryByResolution, compareCNCohort, compareCohort
from ..eval.compare_cn import allele2CN, readCNFile
from ..index.build import buildIndexFromMsa, loadIndex, saveIndex
from ..msa.genemsa import saveAllMsa
from ..sim.cohort import (
    generateCohortFastq,
    readHaplotypeTable,
    sampleCohortAlleles,
    syntheticHaplotypeTable,
)
from ..sim.synth_db import SynthConfig, makeSyntheticDB
from ..utils import logger
from .main import createParser as pipelineParser, main as pipelineMain


def createParser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Simulated cohort end-to-end eval")
    p.add_argument("--out", required=True, help="working folder")
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--depth", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=87)
    p.add_argument("--db-seed", type=int, default=7)
    p.add_argument("--n-genes", type=int, default=8)
    p.add_argument("--alleles-per-gene", type=int, default=16)
    p.add_argument("--gene-length", type=int, default=6000)
    p.add_argument("--error-rate", type=float, default=0.002)
    p.add_argument("--novel-per-sample", type=int, default=0)
    p.add_argument("--read-profile", default="uniform",
                   choices=["uniform", "hiseq"],
                   help="simulator error model (hiseq: position-dependent "
                        "quality, art_illumina-like)")
    p.add_argument("--haplotype-csv", default="",
                   help="real haplotype table (default: synthetic)")
    p.add_argument("--allele-strategy", default="full",
                   choices=["full", "exonfirst", "report"])
    p.add_argument("--cn-cohort", action="store_true")
    p.add_argument("--log-level", default="INFO")
    return p


def main(args: argparse.Namespace) -> dict:
    logging.basicConfig(level=args.log_level)
    logger.setLevel(args.log_level)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # 1. database + index
    db = makeSyntheticDB(
        SynthConfig(
            seed=args.db_seed,
            n_genes=args.n_genes,
            n_alleles_per_gene=args.alleles_per_gene,
            gene_length=args.gene_length,
        )
    )
    index_prefix = str(out / "index")
    if not os.path.exists(index_prefix + ".npz"):
        index = buildIndexFromMsa(db)
        saveIndex(index, index_prefix)
        saveAllMsa(db, str(out / "msa"))
    else:
        index = loadIndex(index_prefix)

    # 2. cohort simulation with truth
    prefix = str(out / "sim")
    if not os.path.exists(prefix + "_summary.csv"):
        if args.haplotype_csv:
            haplo = readHaplotypeTable(args.haplotype_csv)
        else:
            haplo = syntheticHaplotypeTable(
                [n.split("*")[0] for n in index.gene_names], seed=args.seed
            )
        truths = sampleCohortAlleles(index, haplo, args.samples, seed=args.seed)
        generateCohortFastq(
            db, index, truths, prefix,
            depth=args.depth, seed=args.seed,
            error_rate=args.error_rate,
            novel_per_sample=args.novel_per_sample,
            profile=args.read_profile,
        )
    truth_df = pd.read_csv(prefix + "_summary.csv", sep="\t", dtype=str)

    # 3. run the pipeline over the cohort
    rows = [
        {
            "name": row["name"],
            "r1": f"{row['name']}.read.1.fq.gz",
            "r2": f"{row['name']}.read.2.fq.gz",
        }
        for _, row in truth_df.iterrows()
    ]
    cohort_csv = str(out / "cohort.csv")
    pd.DataFrame(rows).to_csv(cohort_csv, index=False)
    cli = [
        "--input-csv", cohort_csv,
        "--index-prefix", index_prefix,
        "--output-cohort-name", str(out / "cohort"),
        "--allele-strategy", args.allele_strategy,
    ]
    if args.cn_cohort:
        cli.append("--cn-cohort")
    pipelineMain(pipelineParser().parse_args(cli))

    # 4. evaluate against the truth
    answer = {
        str(row["id"]): sorted(str(row["alleles"]).split("_"))
        for _, row in truth_df.iterrows()
    }
    pred_df = pd.read_csv(str(out / "cohort.allele.tsv"), sep="\t", dtype=str)
    predict = {}
    for _, row in pred_df.iterrows():
        sid = str(row["name"]).split(".variant")[0].rsplit(".", 1)[-1]
        alleles = str(row["alleles"]).split("_") if isinstance(row["alleles"], str) else []
        predict[sid] = sorted(a for a in alleles if a and a != "nan")

    results = compareCohort(answer, predict)
    summary = calcSummaryByResolution(r for rs in results.values() for r in rs)
    # human-debugging surface: per-call CSV, per-gene CSV + chart
    # (reference kg_eval.py:167-229)
    from ..eval.compare import saveCompareReport

    saveCompareReport(results, str(out / "compare"))

    cn_answer = {sid: allele2CN(alleles) for sid, alleles in answer.items()}
    cn_predict = {sid: allele2CN(alleles) for sid, alleles in predict.items()}
    cn_df = compareCNCohort(cn_answer, cn_predict)

    report = {
        "allele_summary": summary,
        "allele_acc_gene": summary["match_gene"] / max(summary["total"], 1),
        "allele_acc_7digit": summary["match7"] / max(summary["total"], 1),
        "cn_errors": int(cn_df["diff_abs"].sum()) if len(cn_df) else 0,
    }

    # grade novel DISCOVERY (not just typing) against the spiked truth
    # (position + base level, split by victim-gene CN)
    if args.novel_per_sample and "novel" in truth_df.columns:
        from ..eval.novel_qa import gradeNovelDiscovery

        # the typing-file suffix, not the CLI name: main() rewrites
        # exonfirst -> exonfirst_1 and report -> em before writing
        # `*.pv.<method>.tsv` (pipeline/main.py:258-262)
        method = {"report": "em", "exonfirst": "exonfirst_1"}.get(
            args.allele_strategy, args.allele_strategy
        )
        report["novel_discovery"] = gradeNovelDiscovery(
            truth_df, str(out / "msa"), method=method,
        )
    logger.info(f"[Research] {report}")
    pd.DataFrame([report]).to_json(str(out / "report.json"))
    return report


def cli() -> None:
    main(createParser().parse_args())


if __name__ == "__main__":
    cli()
