"""The fused device classification (align/device_annotate.py) must be
bit-identical to the host oracle (annotate.py:annotateArrays) — same
evidence CSRs, NM, novel registration order, depth/pileup."""
import numpy as np
import pytest

from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.align.device_annotate import DeviceAnnotator, getDeviceAnnotator
from kir_graph_tpu.align.encode import encodeReads
from kir_graph_tpu.align.pipeline import GraphAligner
from kir_graph_tpu.align.stream import alignAnnotateEvidence
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


def assertEvidenceEqual(got, want):
    ev_g, depth_g, pileup_g = got
    ev_w, depth_w, pileup_w = want
    np.testing.assert_array_equal(ev_g.gene, ev_w.gene)
    np.testing.assert_array_equal(ev_g.nh, ev_w.nh)
    np.testing.assert_array_equal(ev_g.nm, ev_w.nm)
    np.testing.assert_array_equal(ev_g.pass_mask, ev_w.pass_mask)
    np.testing.assert_array_equal(ev_g.pos_indptr, ev_w.pos_indptr)
    np.testing.assert_array_equal(ev_g.pos_idx, ev_w.pos_idx)
    np.testing.assert_array_equal(ev_g.neg_indptr, ev_w.neg_indptr)
    np.testing.assert_array_equal(ev_g.neg_idx, ev_w.neg_idx)
    assert list(ev_g.ids) == list(ev_w.ids)
    assert [(v.ref, v.pos, v.val, v.id) for v in ev_g.novel_variants] == [
        (v.ref, v.pos, v.val, v.id) for v in ev_w.novel_variants
    ]
    assert ev_g.n_catalog == ev_w.n_catalog
    np.testing.assert_array_equal(np.asarray(depth_g), np.asarray(depth_w))
    np.testing.assert_array_equal(np.asarray(pileup_g), np.asarray(pileup_w))


@pytest.fixture(scope="module")
def batch(synth_genes, synth_index):
    seqs = {}
    for gname in synth_index.gene_names[:3]:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (1, 4):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
    sim = simulatePairedReads(seqs, depth=12, seed=9, error_rate=0.004)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return c1, l1, c2, l2


def test_device_annotate_bit_identical(synth_index, batch):
    c1, l1, c2, l2 = batch
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    da = DeviceAnnotator(aligner, ann)
    assert da.ok
    got = da.annotateChunk(c1, l1, c2, l2)
    assert got is not None
    res = aligner.alignPairs(c1, l1, c2, l2)
    want_ev, want_depth, want_pileup = ann.annotateArrays(res)
    assertEvidenceEqual(got, (want_ev, want_depth, want_pileup))


def test_device_annotate_long_deletion():
    """Junction reads (pseudo-ref remap) + gapped traceback jobs +
    mid-band catalogued deletions: the device path must reproduce the
    host finalize's junction shift and run canonicalisation exactly."""
    from kir_graph_tpu.index.build import buildIndexFromMsa
    from kir_graph_tpu.msa.genemsa import Block, Genemsa

    rng = np.random.default_rng(23)
    L = 6000
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
    DEL_POS, DEL_LEN = 2500, 200

    msa = Genemsa(
        gene_name="KIR3DP1", blocks=[Block("gene", "gene_fragment", L)]
    )

    def mut(s, n, seed):
        r = np.random.default_rng(seed)
        arr = list(s)
        for p in r.integers(0, L, n):
            arr[p] = "ACGT"[("ACGT".index(arr[p]) + 1) % 4]
        return "".join(arr)

    short_carrier = mut(base, 4, 4)
    short_carrier = short_carrier[:1200] + "-" * 12 + short_carrier[1212:]
    carrier = mut(base, 5, 3)
    carrier = carrier[:DEL_POS] + "-" * DEL_LEN + carrier[DEL_POS + DEL_LEN:]
    msa.append("KIR3DP1*0010101", mut(base, 6, 1))
    msa.append("KIR3DP1*0020101", short_carrier)
    msa.append("KIR3DP1*0040101", carrier)
    msa.append("KIR3DP1*BACKBONE", msa.get_consensus(include_gap=False))
    msa.set_reference("KIR3DP1*BACKBONE")
    index = buildIndexFromMsa({"KIR3DP1": msa})
    assert index.pseudo_refs, "long deletion must create a pseudo-ref"

    seqs = {
        a: msa.get(a).replace("-", "")
        for a in ("KIR3DP1*0040101", "KIR3DP1*0020101")
    }
    sim = simulatePairedReads(seqs, depth=25, seed=7, error_rate=0.002)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(index)
    ann = VariantAnnotator(index)
    da = DeviceAnnotator(aligner, ann)
    assert da.ok
    got = da.annotateChunk(c1, l1, c2, l2)
    assert got is not None
    res = aligner.alignPairs(c1, l1, c2, l2)
    want = ann.annotateArrays(res)
    # the scenario must actually exercise both machineries
    assert want[0].pass_mask.mean() > 0.9
    assertEvidenceEqual(got, want)


def test_stream_driver_multichunk(synth_index, batch, monkeypatch):
    """The chunked device driver (pipelined) == one-shot host path."""
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "1")
    c1, l1, c2, l2 = batch
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    got = alignAnnotateEvidence(
        aligner, ann, c1, l1, c2, l2, chunk=256
    )
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "0")
    want = alignAnnotateEvidence(aligner, ann, c1, l1, c2, l2)
    assertEvidenceEqual(got, want)


def test_runtime_fallback(synth_index, batch, monkeypatch):
    """A hard-job overflow falls back to the host path, same results."""
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "1")
    monkeypatch.setattr(DeviceAnnotator, "MAX_HARD", 0)
    c1, l1, c2, l2 = batch
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    got = alignAnnotateEvidence(aligner, ann, c1, l1, c2, l2)
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "0")
    want = alignAnnotateEvidence(aligner, ann, c1, l1, c2, l2)
    assertEvidenceEqual(got, want)


def test_getter_respects_env(synth_index, monkeypatch):
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    monkeypatch.delenv("KGT_DEVICE_ANNOTATE", raising=False)
    assert getDeviceAnnotator(aligner, ann) is None  # default off
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "0")
    assert getDeviceAnnotator(aligner, ann) is None
    monkeypatch.setenv("KGT_DEVICE_ANNOTATE", "1")
    assert getDeviceAnnotator(aligner, ann) is not None
