"""
kirpipe CLI: run one or more KIR typing tools over a sample wildcard and
merge their allele tables (reference kir/main.py).
"""
from __future__ import annotations

import argparse
import logging

import pandas as pd

from ..utils import getGeneName, logger
from .external import EXTERNAL_TOOLS
from .graphkir_tool import GraphKirTool


def concatResult(results: list[str], output_name: str) -> pd.DataFrame:
    dfs = []
    for name in results:
        df = pd.read_csv(name + ".tsv", sep="\t", dtype=str)
        df["method"] = name
        dfs.append(df)
    merged = pd.concat(dfs)
    merged.to_csv(output_name + ".tsv", index=False, sep="\t")
    return merged


def showResult(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, row in df.iterrows():
        for allele in str(row["alleles"]).split("_"):
            rows.append(
                {
                    "id": row["id"],
                    "method": row.get("method", ""),
                    "gene": getGeneName(allele),
                    "allele": allele,
                }
            )
    long_df = pd.DataFrame(rows)
    with pd.option_context("display.max_rows", None):
        print(long_df.groupby(["id", "gene", "method"])["allele"].apply(list))
    return long_df


def createParser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Run multiple KIR typing tools over a sample wildcard"
    )
    parser.add_argument("sample_name", help="sample pattern, e.g. data/cohort.{}")
    parser.add_argument(
        "--tools", nargs="+", default=["graphkir"],
        choices=["graphkir", *EXTERNAL_TOOLS],
    )
    parser.add_argument("--thread", default=4, type=int)
    parser.add_argument("--engine", default="docker",
                        choices=["docker", "podman", "local"])
    parser.add_argument("--ipd-version", default="2100")
    parser.add_argument("--index-prefix", default="",
                        help="prebuilt kir_graph_tpu index (graphkir tool)")
    parser.add_argument("--final-name", default="kir_merge")
    parser.add_argument("--log-level", default="INFO")
    return parser


def main() -> None:
    args = createParser().parse_args()
    logging.basicConfig(level=args.log_level)

    factory = {"graphkir": GraphKirTool(index_prefix=args.index_prefix)}
    for name, cls in EXTERNAL_TOOLS.items():
        factory[name] = cls()

    results = []
    for tool in args.tools:
        module = factory[tool]
        module.setIPDVersion(args.ipd_version)
        module.setThreads(args.thread)
        module.file_adapter.setPattern(args.sample_name)
        module.executor.setEngine(args.engine)
        result = module.runAll(args.sample_name)
        results.append(result)
        logger.info(f"[{tool}] result {result}.tsv")

    df = concatResult(results, args.final_name)
    showResult(df)


if __name__ == "__main__":
    main()
