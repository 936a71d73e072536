"""Sharded cohort step + split-stage driver consistency + dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kir_graph_tpu.align.encode import encodeReads, revCompCodes
from kir_graph_tpu.parallel.cohort import (
    SplitCohortStep,
    buildDeviceArrays,
    cohortStep,
)
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def device_batch(synth_genes, synth_index):
    arr = buildDeviceArrays(synth_index)
    gname = synth_index.gene_names[0]
    g = synth_index.genes[gname]
    seqs = {
        g.alleles[0]: alleleUngappedSeq(synth_genes[gname.split("*")[0]], g.alleles[0])
    }
    sim = simulatePairedReads(seqs, depth=6, seed=13, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    rc1 = revCompCodes(c1, l1)
    rc2 = revCompCodes(c2, l2)
    batch = tuple(
        jnp.asarray(x)
        for x in (c1, l1.astype(np.int32), c2, l2.astype(np.int32), rc1, rc2)
    )
    return arr, batch


def test_split_matches_monolith(device_batch):
    arr, batch = device_batch
    c1, l1, c2, l2, rc1, rc2 = batch
    depth_m, hist_m, loglik_m = cohortStep(
        arr, c1, l1, c2, l2, rc1, rc2, axis_name=None
    )
    split = SplitCohortStep(arr)
    depth_s, hist_s, loglik_s = split(c1, l1, c2, l2, rc1, rc2)
    np.testing.assert_allclose(np.asarray(depth_m), np.asarray(depth_s))
    np.testing.assert_allclose(np.asarray(hist_m), np.asarray(hist_s))
    np.testing.assert_allclose(
        np.asarray(loglik_m), np.asarray(loglik_s), rtol=1e-5
    )


def test_device_step_places_reads(device_batch, synth_index):
    arr, batch = device_batch
    split = SplitCohortStep(arr)
    depth, hist, loglik = split(*batch)
    depth = np.asarray(depth)
    gi = 0  # reads simulated from gene_names[0]
    assert depth[gi].sum() > 0.9 * depth.sum()


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
