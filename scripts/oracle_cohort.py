#!/usr/bin/env python
"""N-sample cohort differential run against the reference's own code.

Extends tests/test_reference_oracle.py (single sample) to a simulated
cohort: every sample is driven through OUR pipeline to its
``.variant.json`` + depth TSV, then BOTH implementations predict CN
(cohort CNgroup fit across all samples) and call alleles under the
``full``, ``exonfirst_1`` and ``em`` strategies.  The report counts
exact agreements per stage; the committed artifact is
docs/ORACLE_r04_report.json.

  python scripts/oracle_cohort.py [workdir] [n_samples] [depth]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from kir_graph_tpu.cn.predict import loadCN, predictSamplesCN  # noqa: E402
from kir_graph_tpu.eval.reference_oracle import (  # noqa: E402
    referencePredictCN,
    referenceTyping,
    writeReferenceCompatJson,
)
from kir_graph_tpu.index.build import buildIndexFromMsa  # noqa: E402
from kir_graph_tpu.pipeline.run import SamplePipeline  # noqa: E402
from kir_graph_tpu.sim.reads import simulatePairedReads, writeFastq  # noqa: E402
from kir_graph_tpu.sim.synth_db import (  # noqa: E402
    SynthConfig,
    alleleUngappedSeq,
    makeSyntheticDB,
)
from kir_graph_tpu.typing.facade import selectKirTypingModel  # noqa: E402


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "oracle_cohort"
    n_samples = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    depth = float(sys.argv[3]) if len(sys.argv) > 3 else 22.0
    os.makedirs(workdir, exist_ok=True)
    t_start = time.time()

    genes = makeSyntheticDB(SynthConfig(seed=7))
    index = buildIndexFromMsa(genes)
    pipe = SamplePipeline(index)
    gnames = index.gene_names
    g3dl3 = next(n for n in gnames if "3DL3" in n)
    others = [n for n in gnames if n != g3dl3]
    rng = np.random.Generator(np.random.Philox(404))

    samples = []
    for s in range(n_samples):
        # KIR-realistic genotype: 3DL3 diploid, others CN 0..3
        spec: dict[str, list[int]] = {
            g3dl3: list(rng.choice(8, size=2, replace=True))
        }
        for g in others:
            cn = int(rng.choice([0, 1, 2, 2, 3]))
            if cn:
                spec[g] = list(rng.choice(10, size=cn, replace=True))
        copies: dict[str, int] = {}
        seqs = {}
        for gname, ai_list in spec.items():
            gene = index.genes[gname]
            msa = genes[gname.split("*")[0]]
            for ai in ai_list:
                a = gene.alleles[int(ai)]
                copies[a] = copies.get(a, 0) + 1
                seqs.setdefault(a, alleleUngappedSeq(msa, a))
        sim = simulatePairedReads(
            seqs, depth=depth, seed=1000 + s, error_rate=0.002,
            allele_copies=copies, sample_name=f"s{s}",
        )
        r1 = os.path.join(workdir, f"s{s}.read.1.fq.gz")
        r2 = os.path.join(workdir, f"s{s}.read.2.fq.gz")
        writeFastq(r1, sim.names, sim.r1)
        writeFastq(r2, sim.names, sim.r2)
        processed = pipe.mapSample(os.path.join(workdir, f"s{s}"), r1, r2)
        pipe.flushWrites()  # artifacts are written on a background thread
        ref_json = processed + ".refcompat.json"
        if not os.path.exists(ref_json):
            writeReferenceCompatJson(processed + ".json", ref_json)
        samples.append(
            {
                "name": f"s{s}",
                "json": processed + ".json",
                "ref_json": ref_json,
                "depth_tsv": processed + ".no_multi.depth.tsv",
            }
        )
        print(f"[oracle] mapped {s + 1}/{n_samples}", flush=True)

    # cohort CN: one CNgroup fit across all samples, both implementations
    depth_tsvs = [s["depth_tsv"] for s in samples]
    our_cns = [os.path.join(workdir, f"{s['name']}.ours.cn.tsv") for s in samples]
    ref_cns = [os.path.join(workdir, f"{s['name']}.ref.cn.tsv") for s in samples]
    predictSamplesCN(depth_tsvs, our_cns, assume_3DL3_diploid=True)
    referencePredictCN(depth_tsvs, ref_cns, assume_3DL3_diploid=True)
    cn_match = 0
    for ours, ref in zip(our_cns, ref_cns):
        a = pd.read_csv(ours, sep="\t")
        b = pd.read_csv(ref, sep="\t")
        if list(a["gene"]) == list(b["gene"]) and list(a["cn"]) == list(b["cn"]):
            cn_match += 1

    report = {
        "n_samples": n_samples,
        "depth": depth,
        "cn_exact_match": cn_match,
        "strategies": {},
    }
    for method in ("full", "exonfirst_1", "em"):
        match = 0
        mismatches = []
        for s, our_cn in zip(samples, our_cns):
            gene_cn = loadCN(our_cn)
            ref_alleles, ref_warn, _ = referenceTyping(
                s["ref_json"], gene_cn, method=method
            )
            if method == "em":
                t = selectKirTypingModel("em", s["json"])
            else:
                t = selectKirTypingModel(
                    method, s["json"], top_n=600, variant_correction=True
                )
            our_alleles, our_warn = t.typing(gene_cn)
            ok = sorted(our_alleles) == sorted(ref_alleles) and sorted(
                our_warn
            ) == sorted(ref_warn)
            match += ok
            if not ok:
                mismatches.append(
                    {
                        "sample": s["name"],
                        "ours": sorted(our_alleles),
                        "reference": sorted(ref_alleles),
                    }
                )
        report["strategies"][method] = {
            "allele_exact_match": match,
            "mismatches": mismatches,
        }
        print(f"[oracle] {method}: {match}/{n_samples} exact", flush=True)

    report["wall_s"] = round(time.time() - t_start, 1)
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "ORACLE_r04_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({
        "cn_exact": f"{cn_match}/{n_samples}",
        **{
            m: f"{v['allele_exact_match']}/{n_samples}"
            for m, v in report["strategies"].items()
        },
        "wall_s": report["wall_s"],
    }))


if __name__ == "__main__":
    main()
