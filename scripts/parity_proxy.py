#!/usr/bin/env python
"""Full-scale golden-example parity proxy run (round-3: real IPD
dimensions, both allele strategies).

Builds a 17-gene x N-allele synthetic IPD-KIR checkout at real scale —
per-gene lengths 4-16 kb, 400 catalogued SNP columns + one ~kb
structural deletion per gene, art-like quality model, 30x depth (the
reference example's coverage) — cold-builds the ab_2dl1s1 index through
the CLI, runs the two example-shaped samples (provided-CN + fitted-CN),
and asserts EXACT recovery under BOTH the `full` and `exonfirst`
strategies.  The second strategy reuses the index + mapping artifacts
via the suffix-resume mechanism.

  python scripts/parity_proxy.py [workdir] [n_alleles_per_gene] [depth]

The committed report lives in docs/PARITY_r03_report.json.
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

from kir_graph_tpu.pipeline.parity import runParityProxy  # noqa: E402


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "parity_full"
    n_alleles = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    depth = float(sys.argv[3]) if len(sys.argv) > 3 else 30.0
    combined: dict = {"strategies": {}}
    for strategy in ("full", "exonfirst"):
        t0 = time.time()
        report = runParityProxy(
            workdir, n_alleles_per_gene=n_alleles, depth=depth, seed=21,
            allele_strategy=strategy, real_scale=True, profile="hiseq",
        )
        report["wall_s"] = round(time.time() - t0, 1)
        combined["strategies"][strategy] = report
        print(json.dumps({
            "strategy": strategy,
            "cn_exact": report["cn_exact"],
            "allele_exact": report["allele_exact"],
            "wall_s": report["wall_s"],
        }), flush=True)
    combined["cn_exact"] = all(
        r["cn_exact"] for r in combined["strategies"].values()
    )
    combined["allele_exact"] = all(
        r["allele_exact"] for r in combined["strategies"].values()
    )
    out = os.path.join(workdir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(combined, f, indent=1, default=str)
    print(json.dumps({
        "cn_exact": combined["cn_exact"],
        "allele_exact": combined["allele_exact"],
        "report": out,
    }))


if __name__ == "__main__":
    main()
