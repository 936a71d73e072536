#!/usr/bin/env python
"""Full-scale golden-example parity proxy run (VERDICT round-1 item 1).

Builds a 17-gene x N-allele synthetic IPD-KIR checkout, cold-builds the
ab_2dl1s1 index through the CLI, runs the two example-shaped samples
(provided-CN + fitted-CN) and writes the exact-match report.

  python scripts/parity_proxy.py [workdir] [n_alleles_per_gene] [depth]

The committed report lives in docs/PARITY.md.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from kir_graph_tpu.pipeline.parity import runParityProxy  # noqa: E402


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "parity_full"
    n_alleles = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    depth = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    t0 = time.time()
    report = runParityProxy(
        workdir, n_alleles_per_gene=n_alleles, depth=depth, seed=21,
        allele_strategy="full",
    )
    report["wall_s"] = round(time.time() - t0, 1)
    out = os.path.join(workdir, "parity_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, default=str)
    print(json.dumps({
        "cn_exact": report["cn_exact"],
        "allele_exact": report["allele_exact"],
        "config": report["config"],
        "wall_s": report["wall_s"],
        "report": out,
    }))


if __name__ == "__main__":
    main()
