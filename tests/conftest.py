"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no test suite at all (SURVEY.md §4); here every op and model
stage is pinned against NumPy oracles, and multi-chip sharding logic is
validated on fake CPU devices — the pattern the driver's dryrun_multichip
check uses as well.

Note: the session's sitecustomize registers the remote 'axon' TPU backend and
forces jax_platforms='axon,cpu' via jax.config at interpreter start, which
shadows the JAX_PLATFORMS env var.  Remote compiles through the tunnel are far
too slow for unit tests, so we override the config back to CPU here, before
any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
