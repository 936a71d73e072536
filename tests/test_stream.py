"""Pipelined align+annotate (align/stream.py) vs the one-shot path:
bit-identical reads/variants/depth/pileup across chunk boundaries,
including novel-SNV registration order and ids."""
import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, encodeReads
from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.align.stream import alignAnnotateStream
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def world(synth_genes, synth_index):
    seqs = {}
    for gname in synth_index.gene_names:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (0, 2):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
    # error_rate high enough that novel SNVs appear in several chunks
    sim = simulatePairedReads(seqs, depth=10, seed=29, error_rate=0.01)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return synth_index, c1, l1, c2, l2


def _pairReadTuple(r):
    return (r.backbone, r.multiple, r.lpv, r.lnv, r.rpv, r.rnv, r.pair_index)


@pytest.mark.parametrize("exon_only", [False, True])
def test_stream_matches_oneshot(world, exon_only):
    index, c1, l1, c2, l2 = world
    assert len(c1) > 512, "need several chunks"
    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)

    result = aligner.alignPairs(c1, l1, c2, l2)
    want_reads, want_depth, want_pileup, want_pass = annotator.annotate(
        result, exon_only=exon_only
    )

    got_reads, got_depth, got_pileup, got_pass = alignAnnotateStream(
        aligner, annotator, c1, l1, c2, l2, chunk=256, exon_only=exon_only
    )

    np.testing.assert_array_equal(got_depth, want_depth)
    np.testing.assert_array_equal(got_pileup, want_pileup)
    np.testing.assert_array_equal(got_pass, want_pass)
    assert len(got_reads["reads"]) == len(want_reads["reads"])
    for g, w in zip(got_reads["reads"], want_reads["reads"]):
        assert _pairReadTuple(g) == _pairReadTuple(w)
    gv, wv = got_reads["variants"], want_reads["variants"]
    assert len(gv) == len(wv)
    for a, b in zip(gv, wv):
        assert (a.pos, a.typ, a.ref, a.val, a.id) == (
            b.pos, b.typ, b.ref, b.val, b.id
        )
    # at least one novel SNV must have crossed a chunk boundary for the
    # merge-remap to be exercised
    assert any(str(v.id).startswith("nv") for v in gv)


def test_stream_host_work_hook_fires(world):
    """The host_work hook must fire exactly once per alignPairs call and
    before any download."""
    index, c1, l1, c2, l2 = world
    aligner = GraphAligner(index)
    fired = []
    aligner.alignPairs(
        c1[:128], l1[:128], c2[:128], l2[:128],
        host_work=lambda: fired.append(1),
    )
    assert fired == [1]


def test_stream_error_correction_matches_oneshot(world):
    """Streamed EC (two-pass, batch-global pileup) == one-shot EC."""
    index, c1, l1, c2, l2 = world
    aligner = GraphAligner(index)
    annotator = VariantAnnotator(index)

    result = aligner.alignPairs(c1, l1, c2, l2)
    want_reads, want_depth, want_pileup, want_pass = annotator.annotate(
        result, error_correction=True
    )
    got_reads, got_depth, got_pileup, got_pass = alignAnnotateStream(
        aligner, annotator, c1, l1, c2, l2, chunk=256,
        error_correction=True,
    )
    np.testing.assert_array_equal(got_depth, want_depth)
    np.testing.assert_array_equal(got_pileup, want_pileup)
    np.testing.assert_array_equal(got_pass, want_pass)
    assert len(got_reads["reads"]) == len(want_reads["reads"])
    for g, w in zip(got_reads["reads"], want_reads["reads"]):
        assert _pairReadTuple(g) == _pairReadTuple(w)
    gv, wv = got_reads["variants"], want_reads["variants"]
    assert len(gv) == len(wv)
    for a, b in zip(gv, wv):
        assert (a.pos, a.typ, a.ref, a.val, a.id) == (
            b.pos, b.typ, b.ref, b.val, b.id
        )
    # EC must actually have corrected something for this to be a real test
    got_plain = alignAnnotateStream(
        aligner, annotator, c1, l1, c2, l2, chunk=256
    )
    assert len(got_plain[0]["reads"]) != len(want_reads["reads"]) or not (
        np.array_equal(got_plain[1], want_depth)
    ), "EC was a no-op on this batch; raise depth or error rate"


def test_merge_evidence_empty_batch(world):
    """mergeEvidence([]) returns an empty, catalog-shaped EvidenceArrays
    (an all-filtered FASTQ must not crash the fast paths)."""
    from kir_graph_tpu.align.stream import mergeEvidence

    index = world[0]
    ann = VariantAnnotator(index)
    ev = mergeEvidence(ann, [])
    assert len(ev.gene) == 0 and ev.pass_mask.shape == (0,)
    assert ev.n_catalog == len(ann.catalogVariants())
    assert list(ev.pos_indptr) == [0] and list(ev.neg_indptr) == [0]
    assert ev.novel_variants == []
