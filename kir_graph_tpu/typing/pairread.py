"""
PairRead: the per-read-pair positive/negative variant evidence record.

JSON schema kept compatible with the reference's `.variant.json`
(graphkir/hisat2.py:24-66, 847-866) so artifacts interoperate.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

from ..index.variants import Variant


@dataclass
class PairRead:
    l_sam: str = ""
    r_sam: str = ""
    multiple: int = 1            # NH: number of equally-good placements
    backbone: str = ""           # gene backbone the pair mapped to
    lpv: list[str] = field(default_factory=list)  # left mate positive variant ids
    lnv: list[str] = field(default_factory=list)  # left mate negative variant ids
    rpv: list[str] = field(default_factory=list)
    rnv: list[str] = field(default_factory=list)
    # row in the aligner's pair batch (links back to saved placements so
    # novel discovery can pileup the assigned read group only; the
    # reference achieves this via qname filtering of the no_multi BAM,
    # novel_discover.py:237-264)
    pair_index: int = -1


ReadsAndVariantsData = dict  # {"variants": list[Variant], "reads": list[PairRead]}


def writeReadsAndVariantsData(reads_data: ReadsAndVariantsData, filename: str) -> None:
    # vars() instead of dataclasses.asdict(): both are flat dataclasses
    # (str/int/list-of-str fields), and asdict's recursive deep copy
    # costs ~1 s per 20k reads — the dominant share of a sample's
    # artifact emission (docs/BENCH_NOTES.md round 5)
    with open(filename, "w") as f:
        json.dump(
            {
                "variants": [vars(v) for v in reads_data["variants"]],
                "reads": [vars(r) for r in reads_data["reads"]],
            },
            f,
        )


def loadReadsAndVariantsData(filename: str) -> ReadsAndVariantsData:
    with open(filename) as f:
        data = json.load(f)
    variants = []
    for vd in data["variants"]:
        vd = dict(vd)
        vd.pop("length", None)
        variants.append(Variant(**vd))
    return {
        "variants": variants,
        "reads": [PairRead(**r) for r in data["reads"]],
    }


def removeMultipleMapped(reads_data: ReadsAndVariantsData) -> ReadsAndVariantsData:
    """Keep NH==1 pairs only (reference hisat2.py:943-948)."""
    return {
        "variants": reads_data["variants"],
        "reads": [r for r in reads_data["reads"] if r.multiple == 1],
    }


def groupReads(reads: list[PairRead]) -> dict[str, list[PairRead]]:
    out: dict[str, list[PairRead]] = {}
    for r in reads:
        out.setdefault(r.backbone, []).append(r)
    return out


def groupVariants(variants: list[Variant]) -> dict[str, list[Variant]]:
    out: dict[str, list[Variant]] = {}
    for v in variants:
        out.setdefault(v.ref, []).append(v)
    return out
