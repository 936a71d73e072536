"""
Golden-example parity proxy (offline stand-in for the reference example).

The reference's headline correctness check runs its bundled example
(example/test0{0,1}.read{1,2}.fq.gz through main.py:423-606) against
result.{cn,allele}.tsv, on an index built from IPD-KIR 2100.  This build
has zero network egress (DNS resolution fails; see docs/PARITY.md for the
recorded attempt), so this module reproduces the example's exact SHAPE on
a synthetic IPD-scale database:

  * a 17-gene KIR roster rendered as a real IPD checkout (msf gen+nuc,
    gff) -> cold-built via the CLI `--ipd-db` path with `ab_2dl1s1`
    merging, exon-only alleles included (`withexon` in the reference)
  * sample 00 with a PROVIDED CN file via cohort.csv's `cnfile` column
    (reference example/cohort.csv + test00.assigned.cn.tsv), including a
    CN=3 merged gene and CN=0 genes
  * sample 01 through the full depth->CN fit
  * truth includes exon-only (`e`-suffixed) alleles
  * `exonfirst` allele strategy (reference kir_typing.py default for
    real data)

runParityProxy() builds everything, runs the real CLI main(), and
returns an exact-match report; tests/test_parity.py asserts it at
reduced scale, scripts/parity_proxy.py records the full-scale report.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..msa.genemsa import Genemsa
from ..sim.ipd_checkout import writeIpdCheckout
from ..sim.reads import simulatePairedReads, writeFastq
from ..sim.synth_db import SynthConfig, alleleUngappedSeq, makeSyntheticDB
from ..utils import logger

# gene -> merged backbone under the ab_2dl1s1 index (reference kir_msa.py
# merge modes; see msa/builder.py:175-198)
MERGE_OF = {"KIR2DL1": "KIR2DL1S1", "KIR2DS1": "KIR2DL1S1",
            "KIR2DL5A": "KIR2DL5", "KIR2DL5B": "KIR2DL5"}


def mergedBackbone(gene: str) -> str:
    return MERGE_OF.get(gene, gene) + "*BACKBONE"


@dataclass
class ParityTruth:
    name: str
    copies: dict[str, int]                  # allele name (with e) -> copies
    cn: dict[str, int] = field(default_factory=dict)  # backbone -> CN
    cnfile: str = ""


def exonUniqueAlleles(msa: Genemsa) -> list[str]:
    """Alleles whose exon-column string is unique within the gene — the
    only ones identifiable from exon evidence alone, hence the only safe
    exon-only (nuc-only) candidates for an exact-recovery proxy."""
    from ..sim.ipd_checkout import exonConcatSeq

    names = [n for n in msa.alleles if not n.endswith("*BACKBONE")]
    sig = {n: exonConcatSeq(msa, n) for n in names}
    from collections import Counter

    cnt = Counter(sig.values())
    return [n for n in names if cnt[sig[n]] == 1]


def buildProxyCheckout(
    workdir: str,
    n_alleles_per_gene: int = 100,
    seed: int = 21,
    n_exon_only: int = 8,
    real_scale: bool = False,
) -> tuple[dict[str, Genemsa], str, dict[str, list[str]]]:
    """Synthetic 17-gene DB -> IPD checkout with nuc-only alleles.

    ``real_scale`` pushes the DB to real IPD-KIR dimensions: per-gene
    lengths drawn from 4-16 kb (the real 2DL4..3DL3 spread), hundreds of
    catalogued SNP columns, and one ~kb structural deletion per gene
    (the 2DS4/3DP1-style exon dropouts -> spliced pseudo-references at
    scale)."""
    cfg = SynthConfig(
        seed=seed,
        n_genes=17,
        n_alleles_per_gene=n_alleles_per_gene,
        n_snp_sites=(
            400 if real_scale else max(60, int(1.5 * n_alleles_per_gene))
        ),
        n_families=8 if n_alleles_per_gene >= 40 else 4,
        gene_length_range=(4000, 16000) if real_scale else None,
        n_del_sites=4 if real_scale else 3,
        n_long_del_sites=1 if real_scale else 0,
    )
    genes = makeSyntheticDB(cfg)
    rng = np.random.Generator(np.random.Philox(seed + 1))
    exon_only: dict[str, list[str]] = {}
    for g, msa in genes.items():
        cands = exonUniqueAlleles(msa)
        k = min(n_exon_only, max(0, len(cands) - 2))
        if k:
            exon_only[g] = sorted(rng.choice(cands, size=k, replace=False))
    db_path = os.path.join(workdir, "IPDKIR")
    writeIpdCheckout(genes, db_path, exon_only=exon_only)
    return genes, db_path, exon_only


# Per-gene CN truth transcribed from the reference example's
# result.cn.tsv (example/result.cn.tsv: sample 0 = the provided
# test00.assigned.cn.tsv column, sample 1 = the fitted column); the
# merged KIR2DL5 CN is split into A/B per the allele lists in
# example/result.allele.tsv (test00 carries 2DL5A x2 + 2DL5B x1,
# test01 carries one of each).
EXAMPLE_CN: list[dict[str, int]] = [
    {  # test00
        "KIR2DL1": 2, "KIR2DL2": 2, "KIR2DL3": 0, "KIR2DL4": 2,
        "KIR2DL5A": 2, "KIR2DL5B": 1, "KIR2DP1": 1, "KIR2DS1": 1,
        "KIR2DS2": 2, "KIR2DS3": 1, "KIR2DS4": 0, "KIR2DS5": 2,
        "KIR3DL1": 0, "KIR3DL2": 2, "KIR3DL3": 2, "KIR3DP1": 2,
        "KIR3DS1": 2,
    },
    {  # test01
        "KIR2DL1": 2, "KIR2DL2": 1, "KIR2DL3": 1, "KIR2DL4": 2,
        "KIR2DL5A": 1, "KIR2DL5B": 1, "KIR2DP1": 2, "KIR2DS1": 1,
        "KIR2DS2": 1, "KIR2DS3": 1, "KIR2DS4": 1, "KIR2DS5": 1,
        "KIR3DL1": 1, "KIR3DL2": 2, "KIR3DL3": 2, "KIR3DP1": 2,
        "KIR3DS1": 1,
    },
]


def _sampleProfile(
    genes: dict[str, Genemsa],
    exon_only: dict[str, list[str]],
    rng: np.random.Generator,
    sample_idx: int = 0,
) -> dict[str, list[str]]:
    """gene -> allele names, shaped to the real example's CN truth:
    per-gene CNs copied from example/result.cn.tsv (EXAMPLE_CN), one
    exon-only allele in sample 0 (the example's KIR2DS2*00104e).
    Panel genes absent from the example table keep the old random
    draw (small test panels)."""
    profile: dict[str, list[str]] = {}
    cn_vec = EXAMPLE_CN[sample_idx % len(EXAMPLE_CN)]
    # the real test00 carries exactly one exon-only allele, in KIR2DS2
    eo_gene = ""
    if sample_idx == 0:
        eo_cands = [
            g for g in genes
            if exon_only.get(g) and cn_vec.get(g, 0) >= 1
        ]
        if "KIR2DS2" in eo_cands:
            eo_gene = "KIR2DS2"
        elif eo_cands:
            eo_gene = str(rng.choice(eo_cands))
    for g, msa in genes.items():
        names = [n for n in msa.alleles if not n.endswith("*BACKBONE")]
        full = [n for n in names if n not in set(exon_only.get(g, []))]
        if g in cn_vec:
            cn = cn_vec[g]
        elif g == "KIR3DL3":
            cn = 2
        else:
            cn = int(rng.choice([0, 1, 2], p=[0.25, 0.35, 0.4]))
        if not cn:
            continue
        picks: list[str] = []
        if g == eo_gene:
            picks.append(str(rng.choice(exon_only[g])) + "e")
        # distinct alleles per gene, like the real example's samples
        # (example/result.allele.tsv has no homozygous pair): a
        # homozygous pick inside a merged gene is a genuine max-scoring
        # degeneracy — (Y,Y,B) ties-or-loses to (Y,shadow,B) in the
        # reference's own model — so truth must not demand it
        remaining = list(full)
        while len(picks) < cn:
            if remaining:
                pick = str(rng.choice(remaining))
                remaining.remove(pick)
            else:
                pick = str(rng.choice(full))
            picks.append(pick)
        profile[g] = picks
    return profile


def makeParitySamples(
    genes: dict[str, Genemsa],
    exon_only: dict[str, list[str]],
    workdir: str,
    depth: float = 20.0,
    seed: int = 77,
    profile: str = "uniform",
) -> tuple[str, list[ParityTruth]]:
    """Two example-shaped samples; sample 00 gets a provided-CN file.

    ``profile="hiseq"`` simulates with the art-like position-dependent
    quality model (sim/reads.py) and writes real quality strings."""
    rng = np.random.Generator(np.random.Philox(seed))
    truths: list[ParityTruth] = []
    rows = []
    for s in range(2):
        sprofile = _sampleProfile(genes, exon_only, rng, sample_idx=s)
        copies: dict[str, int] = {}
        seqs: dict[str, str] = {}
        for g, picks in sprofile.items():
            for a in picks:
                copies[a] = copies.get(a, 0) + 1
                # reads come from the TRUE full-length sequence even for
                # nuc-only alleles (the DB only saw their exons)
                seqs[a] = alleleUngappedSeq(genes[g], a.rstrip("e"))
        sim = simulatePairedReads(
            seqs, depth=depth, seed=seed + 10 + s, error_rate=0.002,
            allele_copies=copies, sample_name=f"parity{s}",
            profile=profile,
        )
        name = os.path.join(workdir, f"test{s:02d}")
        r1, r2 = name + ".read1.fq.gz", name + ".read2.fq.gz"
        writeFastq(r1, sim.names, sim.r1, quals=sim.q1 or None)
        writeFastq(r2, sim.names, sim.r2, quals=sim.q2 or None)

        cn: dict[str, int] = {}
        for g, picks in sprofile.items():
            bb = mergedBackbone(g)
            cn[bb] = cn.get(bb, 0) + len(picks)
        truth = ParityTruth(name=name, copies=copies, cn=cn)
        if s == 0:  # provided-CN path (reference test00.assigned.cn.tsv)
            truth.cnfile = name + ".assigned.cn.tsv"
            pd.DataFrame(
                [{"gene": g, "cn": c} for g, c in sorted(cn.items())]
            ).to_csv(truth.cnfile, sep="\t", index=False)
        rows.append({"name": name, "r1": r1, "r2": r2,
                     "cnfile": truth.cnfile or None})
        truths.append(truth)
    csv = os.path.join(workdir, "cohort.csv")
    pd.DataFrame(rows).to_csv(csv, index=False)
    return csv, truths


def evaluateParity(
    cohort_name: str, truths: list[ParityTruth], index
) -> dict:
    """Exact-match report: CN per backbone, alleles per sample."""
    report: dict = {"samples": [], "cn_exact": True, "allele_exact": True}
    cn = pd.read_csv(cohort_name + ".cn.tsv", sep="\t", index_col=0)
    al = pd.read_csv(cohort_name + ".allele.tsv", sep="\t")
    backbones = list(index.gene_names)
    for s, truth in enumerate(truths):
        got_cn = dict(cn[cn.columns[s]])
        want_cn = {bb: truth.cn.get(bb, 0) for bb in backbones}
        cn_ok = {bb: int(got_cn.get(bb, 0)) == want_cn[bb] for bb in backbones}
        called = sorted(al.iloc[s]["alleles"].split("_"))
        want = sorted(a for a, c in truth.copies.items() for _ in range(c))
        # secondary metric: e-suffix-insensitive (eval/compare.py:120)
        strip = lambda xs: sorted(x[:-1] if x.endswith("e") else x for x in xs)
        sample_report = {
            "name": truth.name,
            "cn_match": sum(cn_ok.values()),
            "cn_total": len(backbones),
            "cn_wrong": {bb: (int(got_cn.get(bb, 0)), want_cn[bb])
                         for bb, ok in cn_ok.items() if not ok},
            "alleles_called": called,
            "alleles_want": want,
            "allele_exact": called == want,
            "allele_exact_e_insensitive": strip(called) == strip(want),
        }
        report["samples"].append(sample_report)
        report["cn_exact"] &= all(cn_ok.values())
        report["allele_exact"] &= sample_report["allele_exact"]
    return report


def runParityProxy(
    workdir: str,
    n_alleles_per_gene: int = 100,
    depth: float = 20.0,
    seed: int = 21,
    allele_strategy: str = "exonfirst",
    real_scale: bool = False,
    profile: str = "uniform",
) -> dict:
    """Build the proxy DB + samples, run the real CLI, report parity.

    A second call with the same workdir but a different allele strategy
    reuses the cold-built index and per-sample mapping artifacts (the
    suffix-keyed resume mechanism, pipeline/run.py) and re-runs only CN +
    typing under a strategy-suffixed cohort name."""
    from .main import createParser, main

    os.makedirs(workdir, exist_ok=True)
    genes, db_path, exon_only = buildProxyCheckout(
        workdir, n_alleles_per_gene=n_alleles_per_gene, seed=seed,
        real_scale=real_scale,
    )
    csv, truths = makeParitySamples(
        genes, exon_only, workdir, depth=depth, seed=seed + 50,
        profile=profile,
    )
    cohort_name = os.path.join(workdir, f"cohort_{allele_strategy}")
    index_prefix = os.path.join(workdir, "index", "kir")
    args = createParser().parse_args([
        "--input-csv", csv,
        "--ipd-db", db_path,
        "--index-prefix", index_prefix,
        "--msa-type", "ab_2dl1s1",
        "--output-cohort-name", cohort_name,
        "--allele-strategy", allele_strategy,
        "--allele-top-n", "600",  # reference main.py:195
    ])
    main(args)

    from ..index.build import loadIndex

    index = loadIndex(index_prefix)
    report = evaluateParity(cohort_name, truths, index)
    report["config"] = {
        "n_genes": 17, "n_alleles_per_gene": n_alleles_per_gene,
        "depth": depth, "seed": seed, "allele_strategy": allele_strategy,
        "real_scale": real_scale, "profile": profile,
        "exon_only_total": sum(len(v) for v in exon_only.values()),
    }
    logger.info(f"[Parity] cn_exact={report['cn_exact']} "
                f"allele_exact={report['allele_exact']}")
    return report
