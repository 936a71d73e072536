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
    print(
        f"proc {jax.process_index()} OK: depth_sum={depth_np.sum():.0f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
