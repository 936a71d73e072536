"""Equivalence: vectorised annotate() vs the per-read loop oracle.

The vectorised path (annotate.py:annotateArrays) must be call-identical to
annotateLoop, which mirrors the reference's per-read CIGAR/MD/Zs walk
(hisat2.py:279-515,716-800) — same NM accounting, novel registration order,
positive/negative lists, depth/pileup, in every mode.
"""
import numpy as np
import pytest

from kir_graph_tpu.align import (
    GraphAligner,
    VariantAnnotator,
    encodeReads,
)
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def aligned(synth_genes, synth_index):
    """A messy multi-gene sample: 3 genes, CN 1/2/2, sequencing errors."""
    seqs = {}
    copies = {}
    for gene_key, ai in [
        (list(synth_genes)[0], 0),
        (list(synth_genes)[1], 1),
        (list(synth_genes)[1], 4),
        (list(synth_genes)[2], 2),
        (list(synth_genes)[2], 3),
    ]:
        msa = synth_genes[gene_key]
        g = synth_index.genes[f"{gene_key}*BACKBONE"]
        allele = g.alleles[ai]
        seqs[allele] = alleleUngappedSeq(msa, allele)
        copies[allele] = copies.get(allele, 0) + 1
    sim = simulatePairedReads(
        seqs, depth=12, seed=11, error_rate=0.004, allele_copies=copies
    )
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return GraphAligner(synth_index).alignPairs(c1, l1, c2, l2)


def _readsKey(reads_data):
    return [
        (r.backbone, r.multiple, tuple(r.lpv), tuple(r.lnv),
         tuple(r.rpv), tuple(r.rnv))
        for r in reads_data["reads"]
    ]


def _variantsKey(reads_data):
    return [(v.ref, v.pos, v.typ, str(v.val), str(v.id))
            for v in reads_data["variants"]]


@pytest.mark.parametrize(
    "exon_only,error_correction",
    [(False, False), (False, True), (True, False), (True, True)],
)
def test_vectorized_matches_loop(synth_index, aligned, exon_only,
                                 error_correction):
    ann = VariantAnnotator(synth_index)
    got = ann.annotate(
        aligned, exon_only=exon_only, error_correction=error_correction
    )
    want = ann.annotateLoop(
        aligned, exon_only=exon_only, error_correction=error_correction
    )
    g_data, g_depth, g_pile, g_pass = got
    w_data, w_depth, w_pile, w_pass = want
    np.testing.assert_array_equal(g_pass, w_pass)
    np.testing.assert_array_equal(g_depth, w_depth)
    np.testing.assert_array_equal(g_pile, w_pile)
    assert _variantsKey(g_data) == _variantsKey(w_data)
    assert _readsKey(g_data) == _readsKey(w_data)
    # the messy sample must actually exercise the interesting paths
    if not exon_only and not error_correction:
        n_nv = sum(1 for r in g_data["reads"] for v in r.lpv + r.rpv
                   if v.startswith("nv"))
        assert n_nv > 0
        n_pos = sum(len(r.lpv) + len(r.rpv) for r in g_data["reads"])
        n_neg = sum(len(r.lnv) + len(r.rnv) for r in g_data["reads"])
        assert n_pos > 50 and n_neg > 50


def test_vectorized_handles_empty_batch(synth_index):
    from kir_graph_tpu.align.pipeline import AlignResult

    RL = 32
    res = AlignResult(
        gene=np.full(3, -1, dtype=np.int32),
        nh=np.zeros(3, dtype=np.int32),
        cost=np.zeros(3, dtype=np.float32),
        cols_l=np.full((3, RL), -1, dtype=np.int32),
        cols_r=np.full((3, RL), -1, dtype=np.int32),
        bases_l=np.zeros((3, RL), dtype=np.int8),
        bases_r=np.zeros((3, RL), dtype=np.int8),
        len_l=np.full(3, RL, dtype=np.int32),
        len_r=np.full(3, RL, dtype=np.int32),
        rc_l=np.zeros(3, dtype=bool),
        rc_r=np.ones(3, dtype=bool),
    )
    ann = VariantAnnotator(synth_index)
    got = ann.annotate(res)
    want = ann.annotateLoop(res)
    assert _readsKey(got[0]) == _readsKey(want[0]) == []
    np.testing.assert_array_equal(got[1], want[1])
