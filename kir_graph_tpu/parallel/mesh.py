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

Multi-host: `initDistributed()` brings up `jax.distributed` when a
coordinator is configured (explicit args, `KIR_COORDINATOR`, standard JAX
env, SLURM, or TPU-pod auto-detection); `makeMesh` then builds a hybrid
ICI x DCN mesh — the `data` axis spans hosts (per-chip read shards never
talk during a step; only the final psum crosses DCN) while the `model`
axis stays inside each host so the allele all_gather rides ICI.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initDistributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialise the multi-process runtime if one is configured.

    Returns True when running multi-process (after initialisation), False
    for the ordinary single-process case.  Safe to call more than once.

    Configuration sources, in order:
      1. explicit arguments
      2. ``KIR_COORDINATOR`` / ``KIR_NUM_PROCESSES`` / ``KIR_PROCESS_ID``
      3. jax's own auto-detection (TPU pod metadata, SLURM, Open MPI) —
         attempted only when the environment shows one of those launchers,
         so plain single-host runs never pay a probe timeout.
    """
    # do NOT probe via jax.process_count() here: that initialises the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    # (caught by the real 2-process test, tests/test_multiprocess.py)
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return jax.process_count() > 1
    except Exception:
        pass

    coordinator_address = coordinator_address or os.environ.get("KIR_COORDINATOR")
    if num_processes is None and os.environ.get("KIR_NUM_PROCESSES"):
        num_processes = int(os.environ["KIR_NUM_PROCESSES"])
    if process_id is None and os.environ.get("KIR_PROCESS_ID"):
        process_id = int(os.environ["KIR_PROCESS_ID"])

    auto_detectable = any(
        os.environ.get(k)
        for k in (
            "JAX_COORDINATOR_ADDRESS",      # explicit jax env
            "SLURM_NTASKS",                 # SLURM launcher
            "OMPI_COMM_WORLD_SIZE",         # Open MPI launcher
            "TPU_WORKER_HOSTNAMES",         # TPU pod metadata
        )
    )
    if coordinator_address is None and not auto_detectable:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def meshShape(n_devices: int) -> tuple[int, int]:
    """(data, model) factorisation: model gets 2 when n is even, else 1."""
    if n_devices % 2 == 0 and n_devices > 2:
        return n_devices // 2, 2
    return n_devices, 1


def makeMesh(n_devices: int | None = None) -> Mesh:
    """Global 2-axis mesh over all (possibly multi-host) devices.

    Single-process: reshape the local devices.  Multi-process: hybrid
    ICI x DCN layout — hosts tile the leading (data) axis, the model axis
    is placed within each host's devices.
    """
    if jax.process_count() > 1 and n_devices is None:
        from jax.experimental import mesh_utils

        n_local = jax.local_device_count()
        n_hosts = jax.process_count()
        d_local, m = meshShape(n_local)
        try:
            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(d_local, m),
                dcn_mesh_shape=(n_hosts, 1),
            )
        except ValueError:
            # non-TPU backends have no slice_index; granule = process
            # (e.g. the CPU-backed 2-process test)
            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(d_local, m),
                dcn_mesh_shape=(n_hosts, 1),
                process_is_granule=True,
            )
        return Mesh(dev, axis_names=("data", "model"))

    devices = jax.devices()
    n = n_devices or len(devices)
    d, m = meshShape(n)
    dev = np.array(devices[:n]).reshape(d, m)
    return Mesh(dev, axis_names=("data", "model"))
