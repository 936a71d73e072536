"""The array-native typing path (EvidenceBundle -> AlleleTyping.fromEvidence)
must produce bit-identical results to the PairRead list path.

The list path re-loops python objects into count matrices
(reference typing_mulit_allele.py:217-338); the array path scatters the
same instances from CSR form.  Same counts -> same device kernels -> same
calls, likelihoods and rankings.
"""
import numpy as np
import pytest

from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.align.pipeline import GraphAligner
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq
from kir_graph_tpu.typing.allele_typing import AlleleTyping
from kir_graph_tpu.typing.facade import TypingWithPosNegAllele
from kir_graph_tpu.typing.pairread import groupReads, groupVariants, removeMultipleMapped


@pytest.fixture(scope="module")
def typed_world(synth_genes, synth_index):
    """Aligned + annotated two-gene mixture with enough depth to type."""
    from kir_graph_tpu.align.encode import encodeReads

    gnames = synth_index.gene_names
    seqs = {}
    copies = {}
    for gname in gnames[:2]:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (0, 3):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
            copies[g.alleles[ai]] = 1
    sim = simulatePairedReads(
        seqs, depth=25, seed=5, error_rate=0.002, allele_copies=copies
    )
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    res = aligner.alignPairs(c1, l1, c2, l2)
    ev, depth, pileup = ann.annotateEvidence(res)
    return ann, ev


@pytest.mark.parametrize("variant_correction", [False, True])
def test_allele_typing_matches_list_path(typed_world, variant_correction):
    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)

    reads_data = removeMultipleMapped(bundle.toReadsData())
    gene_reads = groupReads(reads_data["reads"])
    gene_vars = groupVariants(reads_data["variants"])
    gene_ev, gene_vars_arr = bundle.splitByGene()

    assert set(gene_reads) == set(gene_ev)
    for gene in sorted(gene_reads):
        t_list = AlleleTyping(
            gene_reads[gene], gene_vars[gene],
            variant_correction=variant_correction,
        )
        t_arr = AlleleTyping.fromEvidence(
            gene_ev[gene], gene_vars_arr[gene],
            variant_correction=variant_correction,
        )
        assert t_list.getReadsNum() == t_arr.getReadsNum()
        np.testing.assert_array_equal(t_list.log_probs, t_arr.log_probs)
        for cn in (1, 2):
            assert t_list._isHomo(cn) == t_arr._isHomo(cn)
        r_list = t_list.typing(2)
        r_arr = t_arr.typing(2)
        assert r_list.allele_name == r_arr.allele_name
        np.testing.assert_array_equal(r_list.value, r_arr.value)
        assert r_list.selectBest() == r_arr.selectBest()


def test_facade_evidence_mode_matches(typed_world):
    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    cn = {g: 2 for g in bundle.gene_names[:2]}

    t_ev = TypingWithPosNegAllele(
        evidence=bundle, variant_correction=True, top_n=300
    )
    t_ls = TypingWithPosNegAllele(
        reads_data=bundle.toReadsData(), variant_correction=True, top_n=300
    )
    a_ev, w_ev = t_ev.typing(cn)
    a_ls, w_ls = t_ls.typing(cn)
    assert a_ev == a_ls
    assert w_ev == w_ls


def test_facade_evidence_exonfirst_matches(typed_world):
    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    cn = {g: 2 for g in bundle.gene_names[:2]}
    t_ev = TypingWithPosNegAllele(evidence=bundle, exon_first=True)
    t_ls = TypingWithPosNegAllele(reads_data=bundle.toReadsData(), exon_first=True)
    assert t_ev.typing(cn) == t_ls.typing(cn)


@pytest.mark.parametrize("exon_only", [False, True])
def test_exonfirst_from_evidence_matches_list_path(typed_world, exon_only):
    """AlleleTypingExonFirst.fromEvidence is bit-identical to the PairRead
    constructor: same stage-1 exon model, same allele groups, same final
    merged result."""
    from kir_graph_tpu.typing.exonfirst import AlleleTypingExonFirst

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    reads_data = removeMultipleMapped(bundle.toReadsData())
    gene_reads = groupReads(reads_data["reads"])
    gene_vars = groupVariants(reads_data["variants"])
    gene_ev, gene_vars_arr = bundle.splitByGene()

    for gene in sorted(gene_reads):
        t_list = AlleleTypingExonFirst(
            gene_reads[gene], gene_vars[gene], exon_only=exon_only,
            candidate_set_threshold=1.0,
        )
        t_arr = AlleleTypingExonFirst.fromEvidence(
            gene_ev[gene], gene_vars_arr[gene], exon_only=exon_only,
            candidate_set_threshold=1.0,
        )
        assert t_list.allele_group == t_arr.allele_group
        np.testing.assert_array_equal(t_list.log_probs, t_arr.log_probs)
        if not exon_only:
            np.testing.assert_array_equal(
                t_list.full_model.log_probs, t_arr.full_model.log_probs
            )
        r_list = t_list.typing(2)
        r_arr = t_arr.typing(2)
        assert r_list.allele_name == r_arr.allele_name
        np.testing.assert_array_equal(r_list.value, r_arr.value)
        assert r_list.selectBest() == r_arr.selectBest()


def test_evidence_npz_roundtrip(typed_world, tmp_path):
    from kir_graph_tpu.typing.evidence import loadEvidence, saveEvidence

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    path = str(tmp_path / "sample.evidence.npz")
    saveEvidence(bundle, path)
    loaded = loadEvidence(
        path, ann.catalogVariants(), [t.name for t in ann.tables]
    )
    np.testing.assert_array_equal(loaded.ev.pos_idx, ev.pos_idx)
    np.testing.assert_array_equal(loaded.ev.neg_indptr, ev.neg_indptr)
    np.testing.assert_array_equal(loaded.ev.pass_mask, ev.pass_mask)
    assert [str(v.id) for v in loaded.ev.novel_variants] == [
        str(v.id) for v in ev.novel_variants
    ]
    assert [(v.ref, v.pos, v.val) for v in loaded.ev.novel_variants] == [
        (v.ref, v.pos, v.val) for v in ev.novel_variants
    ]
    # typing from the round-tripped bundle matches the in-memory bundle
    cn = {g: 1 for g in bundle.gene_names[:1]}
    a1, _ = TypingWithPosNegAllele(evidence=bundle).typing(cn)
    a2, _ = TypingWithPosNegAllele(evidence=loaded).typing(cn)
    assert a1 == a2


def test_catalog_drift_rejected(typed_world, tmp_path):
    from kir_graph_tpu.typing.evidence import loadEvidence, saveEvidence

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    path = str(tmp_path / "drift.evidence.npz")
    saveEvidence(bundle, path)
    with pytest.raises(ValueError, match="catalog"):
        loadEvidence(path, ann.catalogVariants()[:-1], [t.name for t in ann.tables])


def test_catalog_content_drift_rejected(typed_world, tmp_path):
    """Same-SIZE but different-content catalogs must be rejected too:
    saved pos_idx/neg_idx are indices into the exact catalog they were
    built with (fingerprint check, not just the count check)."""
    import copy

    from kir_graph_tpu.typing.evidence import loadEvidence, saveEvidence

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    path = str(tmp_path / "content_drift.evidence.npz")
    saveEvidence(bundle, path)
    drifted = [copy.deepcopy(v) for v in ann.catalogVariants()]
    drifted[0].pos += 1  # same count, different content
    with pytest.raises(ValueError, match="fingerprint"):
        loadEvidence(path, drifted, [t.name for t in ann.tables])


def test_corrupt_evidence_npz_falls_back_to_json(typed_world, tmp_path):
    """A truncated/corrupt npz must raise something loadEvidence's
    callers can catch (pipeline/run.py falls back to .variant.json on
    ANY load failure, not just ValueError)."""
    from kir_graph_tpu.typing.evidence import loadEvidence

    path = str(tmp_path / "corrupt.evidence.npz")
    with open(path, "wb") as f:
        f.write(b"PK\x03\x04 this is not a real zip archive")
    with pytest.raises(Exception):
        loadEvidence(path, [], [])
