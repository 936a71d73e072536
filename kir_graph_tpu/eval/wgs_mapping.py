"""
WGS-extraction mapping QA (reference research/kg_eval_wgs_mapping.py).

The reference compares every read's pre-extraction genome placement
(encoded into read ids by bam2fastq) with its post-extraction placement
on the KIR graph, then reports "significant" genome regions that feed or
starve the KIR index (kg_eval_wgs_mapping.py:35-160, 429-500).  Here the
same accounting runs directly off the simulator's origin labels and the
extraction aligner's placements — no BAM round trip:

* per-origin kept/lost table for the extraction stage (KIR recall,
  background leak-in rate, diploid-region routing)
* origin-gene -> graph-gene migration matrix for the kept reads
* significant-region report: origins whose loss or leak exceeds a
  threshold (the reference's extractSignificantRegion idea)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..utils import logger


@dataclass
class ExtractionQA:
    per_origin: pd.DataFrame          # origin, total, kept, kept_frac
    migration: pd.DataFrame           # origin x mapped-graph-gene counts
    significant: list[dict] = field(default_factory=list)


def originOf(read_name: str) -> str:
    """Simulator read ids are `{sample}:{allele}:{idx}`
    (sim/reads.py:131); the origin is the allele's gene (or the
    background/diploid tag)."""
    parts = read_name.split(":")
    src = parts[1] if len(parts) >= 2 else read_name
    return src.split("*")[0]


def evaluateExtraction(
    read_names: list[str],
    kept_mask: np.ndarray,
    kir_origins: set[str],
    mapped_gene: list[str] | None = None,
    loss_threshold: float = 0.05,
    leak_threshold: float = 0.05,
) -> ExtractionQA:
    """Score one sample's extraction stage.

    read_names: all WGS pair names fed to extractKirReads.
    kept_mask[i]: pair i was kept for the KIR pipeline.
    kir_origins: origin tags that SHOULD be kept (KIR gene names).
    mapped_gene: graph gene per kept pair (same order as the kept subset
    of read_names), for the migration matrix; None skips it.
    """
    origins = np.array([originOf(n) for n in read_names])
    kept_mask = np.asarray(kept_mask, dtype=bool)
    rows = []
    for origin in sorted(set(origins)):
        sel = origins == origin
        total = int(sel.sum())
        kept = int((sel & kept_mask).sum())
        rows.append(
            {
                "origin": origin,
                "is_kir": origin in kir_origins,
                "total": total,
                "kept": kept,
                "kept_frac": kept / max(total, 1),
            }
        )
    per_origin = pd.DataFrame(rows)

    significant = []
    for r in rows:
        if r["is_kir"] and 1 - r["kept_frac"] > loss_threshold:
            significant.append(
                {"origin": r["origin"], "kind": "loss",
                 "frac": round(1 - r["kept_frac"], 4)}
            )
        if not r["is_kir"] and r["kept_frac"] > leak_threshold:
            significant.append(
                {"origin": r["origin"], "kind": "leak",
                 "frac": round(r["kept_frac"], 4)}
            )

    migration = pd.DataFrame()
    if mapped_gene is not None:
        kept_names = [n for n, k in zip(read_names, kept_mask) if k]
        assert len(kept_names) == len(mapped_gene)
        mig: dict[str, dict[str, int]] = {}
        for name, gg in zip(kept_names, mapped_gene):
            o = originOf(name)
            mig.setdefault(o, {}).setdefault(str(gg), 0)
            mig[o][str(gg)] += 1
        migration = pd.DataFrame(mig).T.fillna(0).astype(int)

    kir_rows = per_origin[per_origin["is_kir"]]
    recall = kir_rows["kept"].sum() / max(kir_rows["total"].sum(), 1)
    bg = per_origin[~per_origin["is_kir"]]
    leak = bg["kept"].sum() / max(bg["total"].sum(), 1)
    logger.info(
        f"[Eval] WGS extraction: KIR recall {recall:.4f}, "
        f"background leak {leak:.4f}, "
        f"{len(significant)} significant regions"
    )
    return ExtractionQA(per_origin, migration, significant)
