#!/usr/bin/env python
"""Real-data ingestion smoke: the reference's bundled example FASTQs
(the only real Illumina reads in this sandbox) through the native
loader, the WGS extractor and the exact alignment path.

Without IPD-KIR the CALLS cannot be graded (the index here is the
full-scale synthetic proxy, so ~zero real reads are expected to place);
what this run proves is ingestion robustness: real gzip framing,
read-name styles, quality strings, length variation — no crashes, sane
stats.  Writes docs/REAL_FASTQ_SMOKE.json.
"""
import gzip
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

import numpy as np

EXAMPLE = "/root/reference/example"


def main() -> None:
    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.pipeline import GraphAligner
    from kir_graph_tpu.align.stream import alignAnnotateEvidence
    from kir_graph_tpu.index.build import buildIndexFromMsa
    from kir_graph_tpu.native_io import loadFastqEncoded, nativeAvailable
    from kir_graph_tpu.sim.reads import readFastq
    from kir_graph_tpu.sim.synth_db import SynthConfig, makeSyntheticDB
    from kir_graph_tpu.wgs.extract import WgsIndex, extractKirReads

    report: dict = {"native_loader": bool(nativeAvailable()), "samples": {}}

    # 1. native loader on all four real files
    for sample in ("test00", "test01"):
        srep = {}
        for mate in (1, 2):
            path = f"{EXAMPLE}/{sample}.read{mate}.fq.gz"
            t0 = time.time()
            codes, lens = loadFastqEncoded(path)
            srep[f"read{mate}"] = {
                "pairs": int(len(codes)),
                "len_min": int(lens.min()),
                "len_max": int(lens.max()),
                "mean_len": round(float(lens.mean()), 1),
                "n_frac": round(
                    float(
                        ((codes == 4)
                         & (np.arange(codes.shape[1])[None, :]
                            < lens[:, None])).sum() / max(lens.sum(), 1)
                    ), 6
                ),
                "load_s": round(time.time() - t0, 2),
            }
            # cross-check against the python gzip parser
            names, seqs = readFastq(path)
            assert len(names) == len(codes), "native vs python count"
            assert len(seqs[0]) == int(lens[0])
            assert len(seqs[-1]) == int(lens[-1])
            srep[f"read{mate}"]["name_example"] = names[0][:60]
        assert srep["read1"]["pairs"] == srep["read2"]["pairs"]
        report["samples"][sample] = srep

    # 2. full-scale synthetic index (real-IPD dimensions)
    t0 = time.time()
    genes = makeSyntheticDB(
        SynthConfig(
            seed=21, n_genes=17, n_alleles_per_gene=40,
            gene_length_range=(4000, 16000), n_snp_sites=400,
            n_long_del_sites=1, n_families=8,
        )
    )
    index = buildIndexFromMsa(genes)
    report["index"] = {
        "genes": len(index.gene_names),
        "Lmax": int(index.backbone.shape[1]),
        "pseudo_refs": len(index.pseudo_refs),
        "build_s": round(time.time() - t0, 1),
    }

    # 3. exact path over the real reads (both samples)
    aligner = GraphAligner(index)
    ann = VariantAnnotator(index)
    for sample in ("test00", "test01"):
        c1, l1 = loadFastqEncoded(f"{EXAMPLE}/{sample}.read1.fq.gz")
        c2, l2 = loadFastqEncoded(f"{EXAMPLE}/{sample}.read2.fq.gz")
        t0 = time.time()
        ev, depth, pileup = alignAnnotateEvidence(
            aligner, ann, c1, l1, c2, l2
        )
        report["samples"][sample]["align"] = {
            "pairs": int(len(c1)),
            "mapped_pairs": int((ev.gene >= 0).sum()),
            "passed_pairs": int(ev.pass_mask.sum()),
            "novel_snvs": len(ev.novel_variants),
            "depth_sum": int(np.asarray(depth).sum()),
            "align_s": round(time.time() - t0, 1),
            "note": "synthetic index: ~zero real reads are expected to "
                    "place; this exercises robustness, not calls",
        }

    # 4. WGS extractor over the real FASTQs (synthetic regions)
    wgs_msas = {}
    for i, gname in enumerate(index.gene_names[:2]):
        g = index.genes[gname]
        from kir_graph_tpu.msa.genemsa import Block, Genemsa

        seq = "".join("ACGTN"[c] for c in g.seq)
        m = Genemsa(
            gene_name=f"KIR_region{i}",
            blocks=[Block("gene", "gene_fragment", len(seq))],
        )
        m.append(f"KIR_region{i}*BACKBONE", seq)
        m.set_reference(f"KIR_region{i}*BACKBONE")
        wgs_msas[f"KIR_region{i}"] = m
    wgs = WgsIndex(buildIndexFromMsa(wgs_msas, kmer=24), sorted(wgs_msas))
    t0 = time.time()
    r1o, r2o, _ = extractKirReads(
        wgs, f"{EXAMPLE}/test00.read1.fq.gz", f"{EXAMPLE}/test00.read2.fq.gz",
        "/tmp/smoke_wgs_test00",
    )
    with gzip.open(r1o, "rt") as f:
        kept = sum(1 for _ in f) // 4
    report["wgs_extract"] = {
        "input_pairs": report["samples"]["test00"]["read1"]["pairs"],
        "kept_pairs": int(kept),
        "wall_s": round(time.time() - t0, 1),
    }

    out = os.path.join(
        os.path.dirname(__file__), "..", "docs", "REAL_FASTQ_SMOKE.json"
    )
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
