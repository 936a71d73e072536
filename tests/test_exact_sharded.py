"""The multi-chip exact product path (parallel/exact.py) must be
bit-identical to the single-device path on the same batch."""
import jax
import numpy as np
import pytest

from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.align.encode import encodeReads
from kir_graph_tpu.align.pipeline import GraphAligner
from kir_graph_tpu.align.stream import alignAnnotateEvidence
from kir_graph_tpu.parallel.exact import ShardedExactPath
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq

from test_device_annotate import assertEvidenceEqual


@pytest.fixture(scope="module")
def batch(synth_genes, synth_index):
    seqs = {}
    for gname in synth_index.gene_names[:3]:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (2, 5):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
    sim = simulatePairedReads(seqs, depth=10, seed=13, error_rate=0.004)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return c1, l1, c2, l2


def test_sharded_exact_matches_single_device(synth_index, batch):
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    c1, l1, c2, l2 = batch
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    sp = ShardedExactPath(aligner, ann, devices=jax.devices()[:8])
    got = sp.alignAnnotate(c1, l1, c2, l2)
    want = alignAnnotateEvidence(aligner, ann, c1, l1, c2, l2)
    assertEvidenceEqual(got, want)
    # reads really spread over the shards: every populated shard shows up
    assert got[0].pass_mask.sum() == want[0].pass_mask.sum() > 0


def test_sharded_exact_two_devices(synth_index, batch):
    c1, l1, c2, l2 = batch
    aligner = GraphAligner(synth_index)
    ann = VariantAnnotator(synth_index)
    sp = ShardedExactPath(aligner, ann, devices=jax.devices()[:2])
    got = sp.alignAnnotate(c1, l1, c2, l2)
    want = alignAnnotateEvidence(aligner, ann, c1, l1, c2, l2)
    assertEvidenceEqual(got, want)
