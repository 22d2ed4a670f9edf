"""Golden-snapshot regression test for the full serving pipeline.

Pins the complete program (backbone -> heads -> pred_decode -> device NMS ->
top-K) on fixed params + a fixed cloud, so any future kernel/layer change
that shifts numerics is caught even when per-op parity tests still pass.
Golden values are generated on the CPU backend (the tests' conftest forces
JAX_PLATFORMS=cpu) with a loose-enough tolerance to survive XLA version
bumps but not semantic changes.
"""

import os

import pytest

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import graspnet_forward, init_graspnet, pred_decode
from graspnet_tpu.postproc.nms import nms_top_k

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "decode_tiny.npz")


def _run():
    cfg = GraspNetConfig.tiny()
    params = init_graspnet(jax.random.PRNGKey(1234), cfg)
    cloud = jax.random.uniform(
        jax.random.PRNGKey(99), (1, cfg.num_point, 3), jnp.float32, -0.4, 0.4
    )

    @jax.jit
    def prog(params, cloud):
        ep = graspnet_forward(params, cloud, cfg, train=False)
        grasps, valid = pred_decode(ep, cfg)
        return jax.vmap(lambda g, v: nms_top_k(g, v, k=10))(grasps, valid)

    rows, vmask = jax.device_get(prog(params, cloud))
    return np.asarray(rows[0]), np.asarray(vmask[0])


@pytest.mark.slow
def test_serving_pipeline_matches_golden():
    rows, vmask = _run()
    if not os.path.exists(GOLDEN):
        np.savez(GOLDEN, rows=rows, vmask=vmask)
        raise AssertionError(
            f"golden file created at {GOLDEN}; commit it and re-run"
        )
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(vmask, g["vmask"])
    np.testing.assert_allclose(rows, g["rows"], rtol=1e-4, atol=1e-5)
