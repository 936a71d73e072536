"""Worker process for the real multi-process runtime test.

Launched twice by tests/test_multiprocess.py with KIR_COORDINATOR /
KIR_NUM_PROCESSES / KIR_PROCESS_ID set: brings up `jax.distributed` via
`initDistributed`, builds the hybrid ICI x DCN mesh via `makeMesh`, and
runs one sharded cohort step whose depth/histogram/likelihood psums must
cross the process boundary.  Each process independently checks the
pooled result against a single-device reference computed locally.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

flags = os.environ.get("XLA_FLAGS", "")
tok = "--xla_force_host_platform_device_count="
assert tok + "2" in flags, f"parent must set {tok}2 (got {flags!r})"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np  # noqa: E402

from kir_graph_tpu.parallel.mesh import initDistributed, makeMesh  # noqa: E402


def main() -> None:
    assert initDistributed(), "initDistributed must detect KIR_* config"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert len(jax.devices()) == 4, "global device count"

    mesh = makeMesh()  # multi-process branch: hybrid ICI x DCN layout
    assert mesh.devices.shape == (4, 1), mesh.devices.shape
    # the data axis spans both processes (DCN): psum must cross them
    procs_on_data = {
        d.process_index for d in mesh.devices[:, 0]
    }
    assert procs_on_data == {0, 1}, procs_on_data

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _buildTinyWorld
    from kir_graph_tpu.parallel.cohort import cohortStep, makeShardedCohortStep

    arr, batch = _buildTinyWorld(n_pairs=64)  # deterministic in both procs
    c1, l1, c2, l2, rc1, rc2 = (np.asarray(x) for x in batch)
    mem = np.asarray(arr.membership)

    def gshard(x, spec):
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    step = makeShardedCohortStep(mesh, arr)
    depth, hist, loglik = step(
        gshard(c1, P("data")), gshard(l1, P("data")),
        gshard(c2, P("data")), gshard(l2, P("data")),
        gshard(rc1, P("data")), gshard(rc2, P("data")),
        gshard(mem, P(None, "model")),
    )
    depth.block_until_ready()
    assert depth.is_fully_replicated
    depth_np = np.asarray(depth)
    hist_np = np.asarray(hist)
    loglik_np = np.asarray(loglik)

    # single-device reference computed locally in this same process
    ref = jax.jit(
        lambda *a: cohortStep(arr, *a, axis_name=None)
    )(
        jnp.asarray(c1), jnp.asarray(l1), jnp.asarray(c2),
        jnp.asarray(l2), jnp.asarray(rc1), jnp.asarray(rc2),
    )
    ref_depth, ref_hist, ref_loglik = (np.asarray(x) for x in ref)

    assert depth_np.sum() > 0, "no reads placed"
    np.testing.assert_array_equal(depth_np, ref_depth)
    np.testing.assert_allclose(hist_np, ref_hist, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(loglik_np, ref_loglik, rtol=1e-4, atol=1e-4)

    # ---- typing stage over the SAME cross-process mesh: the sharded
    # beam + sharded CN grid must call exactly what the host path calls
    from kir_graph_tpu.parallel.typing import (  # noqa: E402
        ShardedAlleleTyping,
        shardedCNFit,
    )
    from kir_graph_tpu.typing.allele_typing import AlleleTyping  # noqa: E402

    tmesh = jax.sharding.Mesh(mesh.devices.reshape(2, 2), ("data", "model"))
    host_model = _buildTypingWorld()
    want = host_model.typing(2)
    sharded = ShardedAlleleTyping.fromModel(host_model, tmesh)
    got = sharded.typing(2)
    assert got.allele_name == want.allele_name, (
        got.allele_name[:3], want.allele_name[:3]
    )
    np.testing.assert_array_equal(got.value, want.value)
    assert got.selectBest() == want.selectBest()

    depths = [0.4, 24.1, 25.9, 50.2, 49.1, 26.0, 24.4, 73.8]
    from kir_graph_tpu.cn.models import CNgroup  # noqa: E402

    host_cn = CNgroup()
    host_cn.bin_num += 200
    host_cn.fit(depths, 0.0, None)
    sh_cn = shardedCNFit(tmesh, depths, 0.0, None)
    assert sh_cn.base == host_cn.base, (sh_cn.base, host_cn.base)
    assert sh_cn.assignCN(depths) == host_cn.assignCN(depths)

    print(
        f"proc {jax.process_index()} OK: depth_sum={depth_np.sum():.0f} "
        f"typing={got.selectBest()} cn_base={sh_cn.base:.2f}",
        flush=True,
    )


def _buildTypingWorld() -> "object":
    """Deterministic tiny typing model, identical in every process."""
    from kir_graph_tpu.align.annotate import VariantAnnotator
    from kir_graph_tpu.align.encode import encodeReads
    from kir_graph_tpu.align.pipeline import GraphAligner
    from kir_graph_tpu.index.build import buildIndexFromMsa
    from kir_graph_tpu.sim.reads import simulatePairedReads
    from kir_graph_tpu.sim.synth_db import (
        SynthConfig,
        alleleUngappedSeq,
        makeSyntheticDB,
    )
    from kir_graph_tpu.typing.allele_typing import AlleleTyping

    genes = makeSyntheticDB(
        SynthConfig(seed=2, n_genes=2, n_alleles_per_gene=8, gene_length=2048)
    )
    index = buildIndexFromMsa(genes)
    gname = index.gene_names[0]
    g = index.genes[gname]
    msa = genes[gname.split("*")[0]]
    seqs = {
        g.alleles[0]: alleleUngappedSeq(msa, g.alleles[0]),
        g.alleles[3]: alleleUngappedSeq(msa, g.alleles[3]),
    }
    sim = simulatePairedReads(seqs, depth=20, seed=9, error_rate=0.002)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(index)
    ann = VariantAnnotator(index)
    res = aligner.alignPairs(c1, l1, c2, l2)
    ev, _, _ = ann.annotateEvidence(res)
    bundle = ann.evidenceBundle(ev)
    gene_ev, gene_vars = bundle.splitByGene()
    gene = sorted(gene_ev)[0]
    model = AlleleTyping.fromEvidence(gene_ev[gene], gene_vars[gene])
    assert model.getReadsNum() > 0
    return model


if __name__ == "__main__":
    main()
