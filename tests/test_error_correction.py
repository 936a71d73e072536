import numpy as np

from kir_graph_tpu.align import GraphAligner, VariantAnnotator, encodeReads
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


def test_pileup_error_correction_reduces_novel_calls(synth_genes, synth_index):
    """High sequencing error -> many nv SNVs; pileup correction removes the
    minority-base ones (reference hisat2.py:609-654 semantics)."""
    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    allele = g.alleles[0]
    seqs = {allele: alleleUngappedSeq(synth_genes[gname.split("*")[0]], allele)}
    sim = simulatePairedReads(seqs, depth=30, seed=5, error_rate=0.01)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    res = GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)

    def novelCount(error_correction):
        reads_data, _, _, passed = ann.annotate(
            res, error_correction=error_correction
        )
        nv = sum(
            1
            for r in reads_data["reads"]
            for v in r.lpv + r.rpv
            if v.startswith("nv")
        )
        return nv, passed.sum()

    nv_raw, passed_raw = novelCount(False)
    nv_ec, passed_ec = novelCount(True)
    assert nv_raw > 0
    assert nv_ec < nv_raw * 0.2  # most error SNVs corrected away
    assert passed_ec >= passed_raw  # corrections can only lower NM
