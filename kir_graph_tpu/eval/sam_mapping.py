"""
SAM-truth mapping evaluation (reference research/kg_eval_mapping.py core:
getEachReadMappedOn 167-185, customSamstatCalc 187-233,
customGenePrecisionCalc 260-353 — the calc layer without the plotly layer).

Works on SAM text: the truth gene comes from the read name (simulated
read ids are "{sample}:{allele}:{i}", a truth SAM's ids start with the
allele), the called gene from the alignment's RNAME.  Output is per-gene
rows matching the reference's four precision `type`s.
"""
from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass
from typing import Callable, Iterable

from ..utils import getGeneName, logger


@dataclass
class ReadRecord:
    id: str
    flag: int
    ref: str


def truthAlleleOfQname(qname: str) -> str:
    """'{sample}:{allele}:{i}' or '{allele}-...' -> source allele name."""
    if ":" in qname:
        for p in qname.split(":"):
            if "*" in p:
                return p
    return qname.split("-")[0]


def truthGeneOfQname(qname: str) -> str:
    return getGeneName(truthAlleleOfQname(qname))


def readSamRecords(filename: str) -> dict[str, list[ReadRecord]]:
    """SAM text -> {read id: [(flag, reference), ...]}
    (reference getEachReadMappedOn, kg_eval_mapping.py:167-185)."""
    data: dict[str, list[ReadRecord]] = defaultdict(list)
    with open(filename) as f:
        for line in f:
            if line.startswith("@"):
                continue
            fields = line.rstrip("\n").split("\t")
            if len(fields) < 3:
                continue
            data[fields[0]].append(
                ReadRecord(
                    id=fields[0],
                    flag=int(fields[1]),
                    ref=fields[2].split("-")[0],
                )
            )
    return data


def samStat(
    total: dict[str, int], reads: dict[str, list[ReadRecord]]
) -> list[dict]:
    """Per-gene miss / proper-pair / multi-mapping rates
    (reference customSamstatCalc, kg_eval_mapping.py:187-233)."""
    data = {
        gene: {"total": num, "count": 0, "miss": 0, "pair": 0, "secd": 0}
        for gene, num in total.items()
    }
    for read_name, info in reads.items():
        g = truthGeneOfQname(read_name)
        if g not in data:
            continue
        data[g]["count"] += 1
        if len([i for i in info if i.ref != "*" and not (i.flag & 256)]) < 2:
            data[g]["miss"] += 1
        if len([i for i in info if i.flag & 2]) >= 2:
            data[g]["pair"] += 1
        data[g]["secd"] += len([i for i in info if i.flag & (2 | 256)]) // 2

    rows = []
    for gene, d in data.items():
        d["miss"] += d["total"] - d["count"]  # removed by the mapper
        rows.append(
            {
                "gene": gene,
                "total": d["total"],
                "count": d["count"],
                "miss_num": d["miss"],
                "miss_perc": d["miss"] / max(d["total"], 1),
                "pair_num": d["pair"],
                "pair_perc": d["pair"] / max(d["total"], 1),
                "secd_num": d["secd"],
                "secd_perc": d["secd"] / max(d["total"], 1),
            }
        )
    return rows


def genePrecision(
    total: dict[str, int],
    reads: dict[str, list[ReadRecord]],
    rename: Callable[[str], str] | None = None,
) -> list[dict]:
    """Per-gene precision/recall in the reference's four flavors
    (customGenePrecisionCalc, kg_eval_mapping.py:260-353): 'all',
    'all-per-read', 'unique-only', 'primary-only'."""
    rename = rename or (lambda s: getGeneName(s))
    data = {
        gene: {
            "total": num, "count": 0, "unique": 0, "unique_count": 0,
            "primary": 0, "secondary": 0, "secondary_count": 0,
            "secondary_correct": 0,
        }
        for gene, num in total.items()
    }
    for read_name, info in reads.items():
        g = truthGeneOfQname(read_name)
        if g not in data:
            continue
        info = [
            i for i in info
            if (i.flag & 2) and i.ref != "*" and not (i.flag & 2048)
        ]
        if not info:
            continue
        d = data[g]
        d["count"] += 1
        truth_r = rename(truthAlleleOfQname(read_name))
        primary = [i for i in info if not (i.flag & 256)]
        if primary and rename(primary[0].ref) == truth_r:
            d["primary"] += 1
        if any(rename(i.ref) == truth_r for i in info):
            d["secondary"] += 1
        for i in info:
            d["secondary_count"] += 1
            if rename(i.ref) == truth_r:
                d["secondary_correct"] += 1
        if len(info) == 2:
            d["unique_count"] += 1
            if primary and rename(primary[0].ref) == truth_r:
                d["unique"] += 1

    rows = []
    for gene, d in data.items():
        cnt = max(d["count"], 1)
        rows.append({
            "gene": gene, "total": d["total"], "count": d["count"],
            "correct": d["secondary"],
            "precision": d["secondary"] / cnt,
            "recall": d["secondary"] / max(d["total"], 1),
            "type": "all",
        })
        rows.append({
            "gene": gene, "total": d["total"],
            "count": d["secondary_count"] / 2,
            "correct": d["secondary_correct"],
            "precision": d["secondary_correct"] / max(d["secondary_count"], 1),
            "recall": d["secondary"] / max(d["total"], 1),
            "type": "all-per-read",
        })
        uc = d["unique_count"] or d["count"]
        rows.append({
            "gene": gene, "total": d["total"], "count": d["unique_count"],
            "correct": d["unique"],
            "precision": d["unique"] / max(uc, 1),
            "recall": d["unique"] / max(d["total"], 1),
            "type": "unique-only",
        })
        rows.append({
            "gene": gene, "total": d["total"], "count": d["count"],
            "correct": d["primary"],
            "precision": d["primary"] / cnt,
            "recall": d["primary"] / max(d["total"], 1),
            "type": "primary-only",
        })
    return rows


def evalSamFile(
    sam_file: str,
    truth_totals: dict[str, int],
    rename: Callable[[str], str] | None = None,
) -> dict[str, list[dict]]:
    """One SAM -> {'stat': samStat rows, 'precision': genePrecision rows}."""
    reads = readSamRecords(sam_file)
    out = {
        "stat": samStat(truth_totals, reads),
        "precision": genePrecision(truth_totals, reads, rename),
    }
    n = sum(t["total"] for t in out["stat"])
    miss = sum(t["miss_num"] for t in out["stat"])
    logger.info(f"[Eval] SAM {sam_file}: {n} truth pairs, {miss} missed")
    return out


def truthTotalsFromNames(names: Iterable[str]) -> dict[str, int]:
    """Simulated read names -> per-gene truth pair counts."""
    totals: dict[str, int] = defaultdict(int)
    for n in names:
        totals[truthGeneOfQname(n)] += 1
    return dict(totals)


# ---------------------------------------------------------------------------
# Gene from->to migration (reference kg_eval_mapping.py:653-787 calc layer)

def isGeneCorrect(to_gene: str, truth_gene: str) -> bool:
    """Merged-backbone-aware gene comparison
    (reference isGeneCorrect, kg_eval_mapping.py:653-665)."""
    if to_gene == "KIR2DL5":
        return to_gene in truth_gene  # KIR2DL5A / KIR2DL5B
    if to_gene == "KIR2DL1S1":
        return truth_gene in ("KIR2DL1", "KIR2DS1")
    if to_gene == "KIR2DL5AB":
        return truth_gene.startswith("KIR2DL5")
    return to_gene == truth_gene


def calcFromTo(reads, truth_names: list[str]) -> list[dict]:
    """Per mapped pair: the gene it was simulated from vs the backbone it
    landed on (reference calcFromToPerSample, kg_eval_mapping.py:667-684).
    ``reads`` are PairRead records whose ``pair_index`` points into
    ``truth_names`` (the aligner batch's qnames)."""
    rows = []
    for read in reads:
        if read.l_sam:
            qname = read.l_sam.split("\t")[0]
        elif read.pair_index >= 0:
            qname = truth_names[read.pair_index]
        else:
            raise ValueError(
                "PairRead has neither l_sam nor pair_index; cannot "
                "recover the truth read name for from->to eval"
            )
        to_gene = getGeneName(read.backbone)
        truth_gene = truthGeneOfQname(qname)
        rows.append({
            "from_allele": truthAlleleOfQname(qname),
            "from": truth_gene,
            "to": to_gene,
            "correct": isGeneCorrect(to_gene, truth_gene),
            "is_multi": read.multiple > 1,
            "multi": read.multiple,
        })
    return rows


def fromToStat(rows: list[dict], allow_multi: bool = True,
               method: str = "") -> list[dict]:
    """Per landing-gene specificity: correct reads / all reads on the gene
    (reference calcFromToStat, kg_eval_mapping.py:725-739)."""
    if not allow_multi:
        rows = [r for r in rows if not r["is_multi"]]
    per_gene: dict[str, list[bool]] = defaultdict(list)
    for r in rows:
        per_gene[r["to"]].append(r["correct"])
    return [
        {
            "to": gene,
            "acc": sum(oks) / len(oks),
            "method": method,
            "multi": allow_multi,
        }
        for gene, oks in sorted(per_gene.items())
    ]


def rocPoints(precision_rows: list[dict], method: str = "") -> list[dict]:
    """Aggregate genePrecision rows into (FDR, recall) points per
    precision type — per gene and overall (reference customRocPlot data
    prep, kg_eval_mapping.py:375-383)."""
    acc: dict[tuple, list[dict]] = defaultdict(list)
    for r in precision_rows:
        acc[(r["type"], r["gene"])].append(r)
    points = []
    overall: dict[str, list[dict]] = defaultdict(list)
    for (ptype, gene), rs in sorted(acc.items()):
        p = sum(r["precision"] for r in rs) / len(rs)
        rec = sum(r["recall"] for r in rs) / len(rs)
        points.append({"method": method, "type": ptype, "gene": gene,
                       "FDR": 1 - p, "recall": rec})
        overall[ptype].extend(rs)
    for ptype, rs in sorted(overall.items()):
        p = sum(r["precision"] for r in rs) / len(rs)
        rec = sum(r["recall"] for r in rs) / len(rs)
        points.append({"method": method, "type": ptype, "gene": "*",
                       "FDR": 1 - p, "recall": rec})
    return points
