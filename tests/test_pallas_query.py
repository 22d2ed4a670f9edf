"""Pallas query-kernel parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from graspnet_tpu import ops
from graspnet_tpu.models.heads import cylinder_query_multi_depth
from graspnet_tpu.ops.pallas.query import (
    ball_query_pallas,
    cylinder_query_multi_pallas,
    multi_query_batched_pallas,
    multi_query_pallas,
)


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    b, n, m = 2, 500, 16
    xyz = rng.uniform(-0.3, 0.3, (b, n, 3)).astype(np.float32)
    centers = xyz[:, :m] + rng.normal(0, 0.01, (b, m, 3)).astype(np.float32)
    q, _ = np.linalg.qr(rng.normal(size=(b, m, 3, 3)))
    return jnp.asarray(xyz), jnp.asarray(centers), jnp.asarray(q, jnp.float32)


class TestCylinderPallas:
    @pytest.mark.slow
    def test_matches_xla(self, scene):
        xyz, centers, rot = scene
        args = (xyz, centers, rot, 0.05, -0.02, (0.01, 0.02, 0.03, 0.04), 16)
        ref = cylinder_query_multi_depth(*args, chunk=16)
        got = cylinder_query_multi_pallas(*args)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    @pytest.mark.slow
    def test_unpadded_n_multiple_of_lane(self, scene):
        xyz, centers, rot = scene
        xyz = jnp.pad(xyz, ((0, 0), (0, 12), (0, 0)), constant_values=5.0)
        args = (xyz, centers, rot, 0.05, -0.02, (0.02, 0.04), 16)
        ref = cylinder_query_multi_depth(*args, chunk=16)
        got = cylinder_query_multi_pallas(*args)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    @pytest.mark.slow
    def test_empty_and_overfull_regions(self, scene):
        xyz, _, rot = scene
        # one center far away (zero hits -> all-zero row), one at the cloud
        # mean with a big radius (overfull -> first nsample in index order)
        centers = jnp.asarray(
            np.stack(
                [
                    np.full((16, 3), 10.0, np.float32),
                    np.zeros((16, 3), np.float32),
                ]
            )
        )
        args = (xyz, centers, rot, 0.5, -0.5, (0.5,), 8)
        ref = cylinder_query_multi_depth(*args, chunk=16)
        got = cylinder_query_multi_pallas(*args)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
        assert (np.asarray(got)[0] == 0).all()  # far center: empty rows


class TestBallPallas:
    def test_matches_xla(self, scene):
        xyz, centers, _ = scene
        ref = ops.ball_query(xyz, centers, 0.1, 16, chunk=16, use_pallas=False)
        got = ball_query_pallas(xyz, centers, 0.1, 16)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_auto_dispatch_cpu_uses_xla(self, scene):
        # on CPU the default path must match the explicit XLA path
        xyz, centers, _ = scene
        auto = ops.ball_query(xyz, centers, 0.1, 16, chunk=16)
        ref = ops.ball_query(xyz, centers, 0.1, 16, chunk=16, use_pallas=False)
        np.testing.assert_array_equal(np.asarray(auto), np.asarray(ref))


class TestBatchedSelection:
    """multi_query_batched_pallas (K stacked selections per program) must
    match the per-seed kernel bit-for-bit, incl. first-hit/zero padding."""

    def test_ball_matches_per_seed(self, scene):
        xyz, centers, _ = scene
        a = multi_query_pallas(xyz, centers, None, 0.1, 0.0, (0.0,), 16,
                               rotate=False)
        b = multi_query_batched_pallas(xyz, centers, None, 0.1, 0.0, (0.0,),
                                       16, rotate=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_cylinder_matches_per_seed(self, scene):
        xyz, centers, rot = scene
        args = (xyz, centers, rot, 0.05, -0.02, (0.01, 0.02, 0.03, 0.04), 16)
        a = multi_query_pallas(*args)
        b = multi_query_batched_pallas(*args)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_and_overfull(self):
        rng = np.random.default_rng(5)
        xyz = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 256, 3)), jnp.float32)
        centers = jnp.asarray(
            np.stack([np.full((3,), 10.0), np.zeros(3)] * 8, 0)[None],
            jnp.float32,
        )  # alternating far (zero hits) / central (overfull)
        got = np.asarray(
            multi_query_batched_pallas(
                xyz, centers, None, 0.5, 0.0, (0.0,), 8, rotate=False
            )
        )[:, :, 0, :]
        ref = np.asarray(ops.ball_query(xyz, centers, 0.5, 8, use_pallas=False))
        np.testing.assert_array_equal(got, ref)
        assert (got[0, 0] == 0).all()  # far center: zero-hit row


@pytest.mark.slow
def test_batched_query_fuzz_configs():
    """Randomized shape/radius sweep: batched Pallas (interpret) == XLA."""
    import jax.numpy as jnp

    from graspnet_tpu.models.heads import cylinder_query_multi_depth
    from graspnet_tpu.ops.pallas.query import multi_query_batched_pallas

    for seed in range(4):
        r = np.random.default_rng(seed)
        n = int(r.choice([130, 257, 384]))
        m = int(r.choice([4, 8, 16]))
        ns = int(r.choice([3, 8, 16]))
        radius = float(r.choice([0.02, 0.1, 0.5]))
        xyz = jnp.asarray(r.uniform(-0.3, 0.3, (1, n, 3)), jnp.float32)
        centers = jnp.asarray(r.uniform(-0.3, 0.3, (1, m, 3)), jnp.float32)
        q, _ = np.linalg.qr(r.normal(size=(m, 3, 3)))
        rot = jnp.asarray(q[None], jnp.float32)
        hmaxs = (0.01, 0.03)
        got = multi_query_batched_pallas(
            xyz, centers, rot, radius, -0.02, hmaxs, ns, rotate=True
        )
        want = cylinder_query_multi_depth(
            xyz, centers, rot, radius, -0.02, list(hmaxs), ns
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want),
            err_msg=f"seed={seed} n={n} m={m} ns={ns} r={radius}",
        )
