"""
Shared utilities: logging, allele-name field helpers, cohort mergers,
JSON encoding of numpy/dataclass payloads, and resource knobs.

Parity target: graphkir/utils.py (logger 31-38, resources 60-86,
name helpers 130-159, mergers 161-179).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import re
from typing import Any

import numpy as np
import pandas as pd

logger = logging.getLogger("kir_graph_tpu")
if not logger.handlers:
    _ch = logging.StreamHandler()
    _ch.setLevel(logging.DEBUG)
    _ch.setFormatter(
        logging.Formatter("%(asctime)s [%(name)s] [%(levelname)8s] %(message)s")
    )
    logger.addHandler(_ch)
logger.propagate = False


_resources = {"threads": 2, "memory_gb": 7}


def getThreads() -> int:
    return int(_resources["threads"])


def setThreads(threads: int) -> None:
    _resources["threads"] = int(threads)


def getMemory() -> int:
    return int(_resources["memory_gb"])


def setMemory(memory_gb: int) -> None:
    _resources["memory_gb"] = int(memory_gb)


class NumpyEncoder(json.JSONEncoder):
    """JSON encoder understanding numpy arrays/scalars and dataclasses."""

    def default(self, obj: Any) -> Any:
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return dataclasses.asdict(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.integer,)):
            return int(obj)
        if isinstance(obj, (np.floating,)):
            return float(obj)
        if isinstance(obj, (np.bool_,)):
            return bool(obj)
        return json.JSONEncoder.default(self, obj)


# ---------------------------------------------------------------------------
# Allele-name helpers.  KIR star alleles look like `KIR2DL1*0030230` where the
# digit fields encode 3/5/7-digit resolution (graphkir/utils.py:130-159).
# ---------------------------------------------------------------------------

def getGeneName(allele: str) -> str:
    """``KIR3DP1*BACKBONE`` -> ``KIR3DP1``"""
    return allele.split("*")[0]


def getAlleleField(allele: str, resolution: int = 7) -> str:
    """``KIR3DP1*0010101`` @5 -> ``00101``; keeps trailing letters at res 7."""
    if "*" not in allele:
        return ""
    patterns = re.findall(r"^\w+\*(\d+\w*)", allele)
    num = str(patterns[0]) if patterns else "new"
    if resolution == 7:
        return num
    return num[:resolution]


def limitAlleleField(allele: str, resolution: int = 7) -> str:
    """``KIR3DP1*0010101`` @5 -> ``KIR3DP1*00101``"""
    return getGeneName(allele) + "*" + getAlleleField(allele, resolution)


# ---------------------------------------------------------------------------
# Cohort mergers (graphkir/utils.py:161-179)
# ---------------------------------------------------------------------------

def mergeAllele(allele_result_files: list[str], final_result_file: str) -> pd.DataFrame:
    """Concatenate per-sample allele TSVs into a cohort allele table."""
    df = pd.concat(pd.read_csv(f, sep="\t") for f in allele_result_files)
    df.to_csv(final_result_file, index=False, sep="\t")
    return df


def mergeCN(cn_result_files: list[str], final_result_file: str) -> pd.DataFrame:
    """Pivot per-sample CN TSVs into a gene x sample cohort table."""
    dfs = []
    for f in cn_result_files:
        df = pd.read_csv(f, sep="\t")
        df["name"] = f
        dfs.append(df)
    df = pd.pivot_table(pd.concat(dfs), values="cn", index="gene", columns=["name"])
    df = df.fillna(0).astype(int)
    df.to_csv(final_result_file, sep="\t")
    return df


def getCommonName(r1: str, r2: str) -> str:
    """Longest common dot-separated prefix of two fastq paths
    (graphkir/main.py:223-250)."""
    name = ""
    for s1, s2 in zip(r1.split("."), r2.split(".")):
        if s1 != s2:
            return name
        name = s1 if not name else name + "." + s1
    return name
