#!/usr/bin/env python
"""Reference-scale research QA (VERDICT round-1 item 8).

Replays the reference's QA cohorts (research/kg_main.py:454-480): N=100
samples at 30x and 15x with pinned seeds on a 17-gene synthetic DB, plus
an adversarial novel-SNV cohort, through the full CLI pipeline; writes
per-run accuracy tables to {out}/qa_summary.json and a markdown table.

  python scripts/research_qa.py [outdir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# CPU by default (deterministic grading runs); KGT_QA_TPU=1 keeps the
# session backend so the SAME cohort configs run end-to-end on the chip
# (VERDICT round-4 item 1: per-stage TPU wall times through the real
# stage driver, reconciled with the streamed bench number)
if not os.environ.get("KGT_QA_TPU"):
    jax.config.update("jax_platforms", "cpu")

from kir_graph_tpu.pipeline.research import createParser, main  # noqa: E402

RUNS = [
    # name, samples, depth, novel_per_sample, read profile, strategy
    ("n100_d30", 100, 30.0, 0, "uniform", "full"),
    ("n100_d15", 100, 15.0, 0, "uniform", "full"),
    ("n25_d30_novel", 25, 30.0, 1, "uniform", "full"),
    # art-like position-dependent quality model (3' error tail)
    ("n25_d30_hiseq", 25, 30.0, 0, "hiseq", "full"),
    # the reference's production WGS configuration
    # (kir/graphkir.py:70-75 runs --allele-strategy exonfirst)
    ("n100_d30_exonfirst", 100, 30.0, 0, "hiseq", "exonfirst"),
]


def run() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "research_qa"
    only = os.environ.get("KGT_QA_ONLY")  # substring filter over run names
    results = {}
    prior = os.path.join(base, "qa_summary.json")
    if only and os.path.exists(prior):
        # a filtered rerun refreshes its runs in place instead of
        # clobbering the rest of the committed summary
        with open(prior) as f:
            results = json.load(f)
    for name, samples, depth, novel, profile, strategy in RUNS:
        if only and only not in name:
            continue
        t0 = time.time()
        args = createParser().parse_args([
            "--out", os.path.join(base, name),
            "--samples", str(samples),
            "--depth", str(depth),
            "--seed", "87",
            "--db-seed", "21",
            "--n-genes", "17",
            "--alleles-per-gene", "30",
            "--gene-length", "4000",
            "--novel-per-sample", str(novel),
            "--read-profile", profile,
            "--allele-strategy", strategy,
            "--log-level", "WARNING",
        ])
        report = main(args)
        report["wall_s"] = round(time.time() - t0, 1)
        report["config"] = {"samples": samples, "depth": depth, "novel": novel, "strategy": strategy}
        results[name] = report
        print(json.dumps({name: report}, default=str), flush=True)
        with open(os.path.join(base, "qa_summary.json"), "w") as f:
            json.dump(results, f, indent=1, default=str)

    lines = [
        "| run | N | depth | novel/sample | gene acc | 7-digit acc | CN errors | wall (s) |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, rep in results.items():
        c = rep["config"]
        lines.append(
            f"| {name} | {c['samples']} | {c['depth']:g} | {c['novel']} "
            f"| {rep['allele_acc_gene']:.4f} | {rep['allele_acc_7digit']:.4f} "
            f"| {rep['cn_errors']} | {rep['wall_s']} |"
        )
    disc = {
        name: rep["novel_discovery"]
        for name, rep in results.items()
        if isinstance(rep.get("novel_discovery"), dict)
    }
    if disc:
        lines += [
            "",
            "Novel-SNV **discovery** (position+alt-base vs spiked truth,",
            "split by victim-gene CN; `eval/novel_qa.py`):",
            "",
            "| run | graded | CN | TP | FP | FN | precision | recall |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for name, d in disc.items():
            for cn in (1, 2):
                s = d.get(f"cn{cn}")
                if not s:
                    continue
                lines.append(
                    f"| {name} | {d['samples_graded']} | {cn} | {s['tp']} "
                    f"| {s['fp']} | {s['fn']} | {s['precision']:.4f} "
                    f"| {s['recall']:.4f} |"
                )
    with open(os.path.join(base, "qa_table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    run()
