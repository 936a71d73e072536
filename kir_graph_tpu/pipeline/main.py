"""
kir-graph-tpu CLI: the `graphkir` equivalent.

Flag surface mirrors the reference CLI (graphkir/main.py:258-420) minus the
external-container engine (no subprocesses here — alignment runs on the
JAX device) and plus `--index-prefix` (prebuilt array index) /
`--msa-prefix` (build index from MSA files).
"""
from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import pandas as pd

from ..cn.predict import predictSamplesCN
from ..index.build import buildIndexFromMsaPrefix, loadIndex, saveIndex
from ..utils import getCommonName, logger, mergeAllele, mergeCN, setThreads
from .run import SamplePipeline


def createParser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="TPU-native Graph-KIR: KIR copy number + star allele typing",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--thread", default=1, help="Host worker threads")
    parser.add_argument(
        "--engine", default="local",
        choices=["local", "docker", "podman", "singularity"],
        help="Execution engine for external tools (MUSCLE/ClustalO during "
        "--ipd-db builds; reference main.py:272)",
    )
    parser.add_argument(
        "--log-level", default="INFO", choices=list(logging._nameToLevel)
    )

    parser.add_argument("--r1", action="append", help="Read-1 FASTQ (repeatable)")
    parser.add_argument("--r2", action="append", help="Read-2 FASTQ (repeatable)")
    parser.add_argument(
        "--input-csv", help="CSV with columns name,r1,r2[,cnfile]"
    )
    parser.add_argument("--output-folder", help="Output folder")
    parser.add_argument("--output-cohort-name", help="Cohort output prefix")

    parser.add_argument(
        "--index-prefix",
        help="Prebuilt array-index prefix (from saveIndex): {prefix}.npz/.json",
    )
    parser.add_argument(
        "--msa-prefix",
        help="MSA file prefix ({prefix}.{gene}.fa/.json) to build the index from",
    )
    parser.add_argument(
        "--ipd-db",
        help="Local IPD-KIR checkout to build the MSA + index from scratch",
    )
    parser.add_argument(
        "--msa-type", default="ab_2dl1s1",
        choices=["merge", "split", "ab", "ab_2dl1s1"],
        help="Gene-merge mode when building from --ipd-db",
    )
    parser.add_argument(
        "--ipd-version", default="2100", help="IPD-KIR version label"
    )
    parser.add_argument(
        "--msa-no-exon-only-allele", action="store_true",
        help="Exclude exon-only alleles when building from --ipd-db",
    )

    # WGS extraction stage (optional pre-filter; reference main.py:93-121)
    parser.add_argument(
        "--step-skip-extraction",
        action="store_true",
        help="Skip the WGS KIR-region read extraction stage (default on "
        "unless --wgs-genome is given)",
    )
    parser.add_argument(
        "--wgs-genome",
        help="Local reference genome FASTA for the WGS extraction stage",
    )
    parser.add_argument(
        "--wgs-index-folder",
        help="Folder holding (or to receive) the reference genome "
        "(hs37d5.fa.gz / hs38noalt.fa.gz); used when --wgs-genome is "
        "not given (reference main.py:72-90)",
    )
    # reference-surface aliases (reference main.py:335-344): the KIR
    # index and genome live together in one folder; --index-wgs points
    # straight at the genome FASTA (our --wgs-genome)
    parser.add_argument(
        "--index-folder",
        help="Folder holding the KIR index (used when --index-prefix is "
        "not given: picks {folder}/kir.npz or the folder's single "
        ".npz) and doubling as --wgs-index-folder for the genome",
    )
    parser.add_argument(
        "--index-wgs",
        help="Path to the WGS reference genome FASTA (alias of "
        "--wgs-genome, reference main.py:342-344)",
    )
    parser.add_argument(
        "--ref-genome", default="hg19", choices=["hg19", "hg38"],
        help="Region coordinate set for WGS extraction",
    )
    parser.add_argument(
        "--cn-diploid-gene", default="", choices=["", "VDR", "RYR1", "EGFR"],
        help="Diploid gene for CN normalisation during WGS extraction",
    )

    parser.add_argument("--cn-exon", action="store_true", help="Exon-only CN depth")
    parser.add_argument("--cn-cohort", action="store_true", help="Cohort-mode CN")
    parser.add_argument(
        "--cn-select", default="p75", choices=["p75", "mean", "median"]
    )
    parser.add_argument(
        "--cn-algorithm", default="LCND", choices=["LCND", "KDE", "CNgroup"]
    )
    parser.add_argument("--cn-dist-dev", default=0.08, type=float)
    parser.add_argument("--cn-3dl3-not-diploid", action="store_true")
    parser.add_argument(
        "--cn-provided", nargs="*", help="Pre-computed CN TSV per sample"
    )
    parser.add_argument(
        "--allele-strategy",
        default="full",
        choices=["full", "exonfirst", "report", "em"],
    )
    parser.add_argument("--allele-top-n", default=600, type=int)
    parser.add_argument("--step-skip-typing", action="store_true")
    parser.add_argument("--plot", action="store_true")
    return parser


def resolveIndex(args) -> "SamplePipeline":
    if args.index_prefix and os.path.exists(args.index_prefix + ".npz"):
        logger.info(f"[Index] Load prebuilt index {args.index_prefix}")
        index = loadIndex(args.index_prefix)
    elif args.msa_prefix:
        logger.info(f"[Index] Build index from MSA {args.msa_prefix}")
        index = buildIndexFromMsaPrefix(args.msa_prefix)
        if args.index_prefix:
            saveIndex(index, args.index_prefix)
    elif args.ipd_db:
        # full cold build: IPD-KIR -> merged MSAs -> left-align -> index
        # (reference buildMSA, main.py:28-69)
        from ..msa.builder import buildKirMsa
        from ..msa.leftalign import genemsaLeftAlign

        base = (args.index_prefix or "index/kir") + f"_{args.ipd_version}_{args.msa_type}"
        Path(base).parent.mkdir(parents=True, exist_ok=True)
        msa_prefix = base + ".msa"
        if not os.path.exists(msa_prefix + ".leftalign.KIR3DL3.json"):
            logger.info(f"[Index] Build MSA from {args.ipd_db} ({args.msa_type})")
            buildKirMsa(
                args.msa_type,
                msa_prefix,
                db_path=args.ipd_db,
                version=args.ipd_version,
                full_length_only=args.msa_no_exon_only_allele,
            )
            genemsaLeftAlign(msa_prefix, msa_prefix + ".leftalign")
        index = buildIndexFromMsaPrefix(msa_prefix + ".leftalign")
        if args.index_prefix:
            saveIndex(index, args.index_prefix)
    else:
        raise ValueError("Provide --index-prefix, --msa-prefix or --ipd-db")
    return SamplePipeline(index)


def main(args: argparse.Namespace) -> None:
    setThreads(int(args.thread))
    logging.basicConfig(level=args.log_level)
    logger.setLevel(args.log_level)
    if getattr(args, "engine", "local") != "local":
        from ..exec_tools import setEngine

        setEngine(args.engine)

    # ---- reference-surface aliases (main.py:335-344)
    if getattr(args, "index_wgs", None) and not args.wgs_genome:
        args.wgs_genome = args.index_wgs
    folder = getattr(args, "index_folder", None)
    if folder:
        if not args.wgs_index_folder:
            # the genome is OPTIONAL in --index-folder (reference
            # main.py:337-339): only route it to the extraction stage
            # when a genome file is actually there — a bare KIR-index
            # folder must not trigger a genome download/failure
            from ..wgs.genome import GENOME_SOURCES

            fname = GENOME_SOURCES[args.ref_genome][0]
            for cand in (fname, fname[: -len(".gz")]):
                if os.path.exists(os.path.join(folder, cand)):
                    args.wgs_index_folder = folder
                    break
        if not args.index_prefix and os.path.isdir(folder):
            kir = os.path.join(folder, "kir")
            if os.path.exists(kir + ".npz"):
                args.index_prefix = kir
            else:
                npz = [f for f in os.listdir(folder) if f.endswith(".npz")]
                if len(npz) == 1:
                    args.index_prefix = os.path.join(folder, npz[0][:-4])

    # ---- inputs
    cn_files: list[str] = []
    if not args.input_csv:
        if not args.r1 or len(args.r1 or []) != len(args.r2 or []):
            raise ValueError("Provide matching --r1/--r2 lists or --input-csv")
        reads = list(zip(args.r1, args.r2))
        names = [getCommonName(a, b) for a, b in reads]
        cn_files = list(args.cn_provided or [""] * len(names))
    else:
        df = pd.read_csv(args.input_csv)
        names = list(df["name"])
        reads = list(zip(df["r1"], df["r2"]))
        cn_files = (
            list(df["cnfile"].fillna("")) if "cnfile" in df.columns
            else [""] * len(names)
        )
    if len(cn_files) != len(names):
        raise ValueError("cnfile count mismatch")
    logger.info(f"[Main] Samples: {names}")

    if args.output_folder:
        Path(args.output_folder).mkdir(exist_ok=True, parents=True)
        names = [str(Path(args.output_folder) / Path(n).name) for n in names]
        output_folder = args.output_folder
    else:
        output_folder = str(Path(names[0]).parent)
    cohort_name = args.output_cohort_name or str(Path(output_folder) / "cohort")
    Path(cohort_name).parent.mkdir(exist_ok=True, parents=True)

    pipe = resolveIndex(args)
    algo = "CNgroup" if args.cn_algorithm == "LCND" else args.cn_algorithm

    # ---- optional WGS extraction stage
    diploid_depths = ["" for _ in names]
    wgs_genome = args.wgs_genome
    if not wgs_genome and getattr(args, "wgs_index_folder", None):
        from ..wgs.genome import buildGenomeIndex

        wgs_genome = buildGenomeIndex(
            args.wgs_index_folder, args.ref_genome,
            diploid_gene=args.cn_diploid_gene,
        )
    if wgs_genome and not args.step_skip_extraction:
        from ..wgs.extract import buildWgsIndex, extractKirReads

        if args.wgs_genome:
            # user-supplied genome: contig-check it (a whole-genome gzip
            # header scan); the --wgs-index-folder route was already
            # validated inside buildGenomeIndex — don't scan twice
            from ..wgs.genome import validateGenome

            validateGenome(
                wgs_genome, args.ref_genome, args.cn_diploid_gene
            )
        diploid_gene = args.cn_diploid_gene if not args.cn_cohort else ""
        wgs = buildWgsIndex(
            wgs_genome, args.ref_genome, diploid_gene=diploid_gene
        )
        new_names, new_reads = [], []
        for i, (name, (fq1, fq2)) in enumerate(zip(names, reads)):
            out = name + ".extract"
            r1, r2, stat = extractKirReads(
                wgs, fq1, fq2, out,
                diploid_out=out + ".diploid" if diploid_gene else "",
            )
            new_names.append(out)
            new_reads.append((r1, r2))
            diploid_depths[i] = stat
        names, reads = new_names, new_reads

    # ---- map + depth (cross-sample pipelined: sample k's host tail and
    # artifact writes overlap sample k+1's device phase)
    processed = pipe.mapCohort(
        [(name, fq1, fq2) for name, (fq1, fq2) in zip(names, reads)]
    )
    # everything must be on disk before depth/CN/typing read it back
    pipe.flushWrites()
    depth_files = [
        pipe.depthStage(prefix, exon_region_only=args.cn_exon)
        for prefix in processed
    ]

    # ---- copy number
    cluster_kwargs = {"base_dev": float(args.cn_dist_dev), "start_base": 2}
    if all(cn_files):
        pass
    elif not args.cn_cohort:
        for i, depth_file in enumerate(depth_files):
            if cn_files[i]:
                continue
            cn_files[i] = pipe.cnSample(
                depth_file,
                cn_select=args.cn_select,
                cn_algorithm=algo,
                assume_3DL3_diploid=not args.cn_3dl3_not_diploid,
                diploid_depth=diploid_depths[i],
                cluster_method_kwargs=cluster_kwargs,
            )
    else:
        suffix = f".{args.cn_select}.cohort.{algo}"
        cn_cohort_name = cohort_name + suffix
        cn_files = [
            str(Path(p).with_suffix(suffix + ".tsv")) for p in depth_files
        ]
        predictSamplesCN(
            depth_files,
            cn_files,
            cluster_method=algo,
            cluster_method_kwargs=cluster_kwargs,
            save_cn_model_path=cn_cohort_name + ".json",
            select_mode=args.cn_select,
        )
    logger.info(f"[CN] files: {cn_files}")
    mergeCN(cn_files, cohort_name + ".cn.tsv")
    logger.info(f"[CN] cohort table: {cohort_name}.cn.tsv")

    # ---- typing
    if not args.step_skip_typing:
        method = args.allele_strategy
        if method == "report":
            method = "em"
        if method == "exonfirst":
            method = "exonfirst_1"
        allele_files = [
            pipe.typeSample(p, cnf, method=method, top_n=args.allele_top_n)
            for p, cnf in zip(processed, cn_files)
        ]
        mergeAllele(allele_files, cohort_name + ".allele.tsv")
        logger.info(f"[Allele] cohort table: {cohort_name}.allele.tsv")

    if args.plot:
        import json

        from ..plot import plotCN, plotGeneDepths, plotReadMappingStat, savePlot

        figs = []
        stats = []
        for prefix in processed:
            stat_file = prefix + ".stat.json"
            if os.path.exists(stat_file):
                with open(stat_file) as f:
                    stats.append(json.load(f))
        figs.extend(plotReadMappingStat(stats, processed))
        for depth_file in depth_files:
            figs.extend(plotGeneDepths(depth_file))
        for cnf in cn_files:
            model_json = cnf[:-4] + ".json"
            if os.path.exists(model_json):
                figs.extend(plotCN(model_json))
        savePlot(cohort_name + ".plot.html", figs)

    from ..trace import TIMER

    logger.info(f"[Trace] stage timings:\n{TIMER.report()}")
    TIMER.save(cohort_name + ".timing.json")
    logger.info("[Main] Success")


def entrypoint() -> None:
    # honor JAX_PLATFORMS even when a site hook pre-imports jax and pins
    # the platform (env alone is ignored once the backend is chosen).
    # CLI-entry only: library users importing this module, or tests calling
    # main() in-process, keep whatever platform their host configured.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass  # backend already initialised; keep whatever it picked
    main(createParser().parse_args())


if __name__ == "__main__":
    entrypoint()
