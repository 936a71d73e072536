"""The sharded typing beam (parallel/typing.py) must call the exact same
alleles as the single-device beam.

Reads shard over the mesh's ``data`` axis, allele columns over ``model``;
the psum'd score reduction can round differently in float32, but the
final float64 host rescore (rescoreF64) re-derives value/fraction from
the exact count matrices, so the END result — names, values, fractions —
is bit-identical.  Same for the sharded CN grid search.
"""
import numpy as np
import pytest

from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.align.pipeline import GraphAligner
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq
from kir_graph_tpu.typing.allele_typing import AlleleTyping


@pytest.fixture(scope="module")
def typed_world(synth_genes, synth_index):
    from kir_graph_tpu.align.encode import encodeReads

    gnames = synth_index.gene_names
    seqs, copies = {}, {}
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


def _meshOf(shape, names):
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_beam_matches_host(typed_world, mesh_shape):
    from kir_graph_tpu.parallel.typing import ShardedAlleleTyping

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    gene_ev, gene_vars = bundle.splitByGene()
    mesh = _meshOf(mesh_shape, ("data", "model"))

    checked = 0
    for gene in sorted(gene_ev):
        host = AlleleTyping.fromEvidence(gene_ev[gene], gene_vars[gene])
        if not host.getReadsNum():
            continue
        for cn in (1, 2, 3):
            want = host.typing(cn)
            sharded = ShardedAlleleTyping.fromModel(host, mesh)
            got = sharded.typing(cn)
            assert got.allele_name == want.allele_name
            np.testing.assert_array_equal(got.value, want.value)
            np.testing.assert_array_equal(got.fraction, want.fraction)
            np.testing.assert_array_equal(
                got.value_sum_indv, want.value_sum_indv
            )
            assert got.selectBest() == want.selectBest()
            checked += 1
    assert checked >= 4


def test_sharded_beam_rejects_candidate_steps(typed_world):
    from kir_graph_tpu.parallel.typing import ShardedAlleleTyping

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    gene_ev, gene_vars = bundle.splitByGene()
    gene = sorted(gene_ev)[0]
    host = AlleleTyping.fromEvidence(gene_ev[gene], gene_vars[gene])
    mesh = _meshOf((8, 1), ("data", "model"))
    sharded = ShardedAlleleTyping.fromModel(host, mesh)
    some = [host.id_to_allele[0]]
    with pytest.raises(NotImplementedError):
        sharded.addCandidate(some)
        sharded.addCandidate(some)  # second step hits the beam


def test_exonfirst_stage2_takes_host_route(typed_world):
    """Pins the documented contract (parallel/typing.py): exonfirst's
    candidate-restricted intron completion must run on the HOST beam —
    a ShardedAlleleTyping wired into its stage 2 raises rather than
    silently computing on one chip, and the identical candidate steps
    complete on the host model it is built from."""
    from kir_graph_tpu.parallel.typing import ShardedAlleleTyping

    ann, ev = typed_world
    bundle = ann.evidenceBundle(ev)
    gene_ev, gene_vars = bundle.splitByGene()
    gene = sorted(gene_ev)[0]
    host = AlleleTyping.fromEvidence(gene_ev[gene], gene_vars[gene])
    cands = [
        [host.id_to_allele[0], host.id_to_allele[1]],
        [host.id_to_allele[0]],
    ]
    # host route (what exonfirst.typingIntron actually does): fine
    for cand in cands:
        host.addCandidate(cand)
    assert host.result[-1].selectBest()

    sharded = ShardedAlleleTyping.fromModel(
        AlleleTyping.fromEvidence(gene_ev[gene], gene_vars[gene]),
        _meshOf((8, 1), ("data", "model")),
    )
    with pytest.raises(NotImplementedError):
        for cand in cands:
            sharded.addCandidate(cand)


def test_sharded_cn_grid_matches_host():
    from kir_graph_tpu.cn.models import CNgroup
    from kir_graph_tpu.parallel.typing import shardedCNFit

    rng = np.random.Generator(np.random.Philox(99))
    # KIR-shaped depth pool: CN 0..3 clusters around a base of ~25
    values = list(
        np.concatenate(
            [
                rng.normal(25 * cn, 1.5, size=n)
                for cn, n in ((0, 4), (1, 10), (2, 14), (3, 4))
            ]
        ).clip(min=0.0)
    )
    host = CNgroup()
    host.bin_num += 200
    host.fit(values, 0.0, None)

    mesh = _meshOf((8,), ("data",))
    sharded = shardedCNFit(mesh, values, 0.0, None)
    assert sharded.base == host.base
    np.testing.assert_allclose(
        sharded.likelihood[:, 1], host.likelihood[:, 1], rtol=1e-6
    )
    assert sharded.assignCN(values) == host.assignCN(values)

    mesh2 = _meshOf((4, 2), ("data", "model"))
    sharded2 = shardedCNFit(mesh2, values, 0.0, None)
    assert sharded2.base == host.base
