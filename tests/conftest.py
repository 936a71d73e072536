"""Test config: force an 8-device virtual CPU mesh before JAX initialises.

Multi-chip sharding tests run on this fake mesh (SURVEY §4.6: the reference
has no distributed runtime; we test psum/all_gather cohort reductions on
XLA's host-platform device emulation).
"""
import os

# The sandbox's sitecustomize imports jax and pins JAX_PLATFORMS to the TPU
# tunnel before any test code runs, so env vars alone are too late; override
# through jax.config before the backend initialises.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # force off the TPU tunnel
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from kir_graph_tpu.sim.synth_db import SynthConfig, makeSyntheticDB  # noqa: E402


@pytest.fixture(scope="session")
def synth_genes():
    return makeSyntheticDB(SynthConfig(seed=7))


@pytest.fixture(scope="session")
def synth_index(synth_genes):
    from kir_graph_tpu.index.build import buildIndexFromMsa

    return buildIndexFromMsa(synth_genes)
