"""
Device mesh setup for cohort-scale runs.

The reference has no distributed runtime (SURVEY §2.4: SLURM job arrays +
GNU parallel).  Here scale-out is a 2-axis `jax.sharding.Mesh`:

* ``data``  — read batches shard across chips (the dominant axis; the KIR
  index is replicated in HBM, reads stream through)
* ``model`` — the allele axis of the typing likelihood matmul shards
  across this axis (alleles x variants tables get large with full IPD-KIR)

Cohort reductions (pooled depth vectors, CN histograms, per-allele
likelihood sums) ride psum/all_gather over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def meshShape(n_devices: int) -> tuple[int, int]:
    """(data, model) factorisation: model gets 2 when n is even, else 1."""
    if n_devices % 2 == 0 and n_devices > 2:
        return n_devices // 2, 2
    return n_devices, 1


def makeMesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    d, m = meshShape(n)
    dev = np.array(devices[:n]).reshape(d, m)
    return Mesh(dev, axis_names=("data", "model"))
