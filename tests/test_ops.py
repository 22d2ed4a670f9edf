"""Parity tests: JAX geometry ops vs NumPy oracles of the CUDA semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspnet_tpu import ops
from tests import oracles


def make_cloud(rng, n=500, near_origin=5):
    pts = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    # sprinkle near-origin points to exercise the FPS skip (‖p‖² <= 1e-3)
    pts[rng.choice(n, near_origin, replace=False)] *= 1e-3
    return pts


class TestFPS:
    def test_matches_oracle(self, rng):
        pts = make_cloud(rng)
        want = oracles.fps_oracle(pts, 64)
        got = np.asarray(ops.furthest_point_sample(pts[None], 64, use_pallas=False))[0]
        np.testing.assert_array_equal(got, want)

    def test_batched(self, rng):
        pts = np.stack([make_cloud(rng), make_cloud(rng)])
        got = np.asarray(ops.furthest_point_sample(pts, 32, use_pallas=False))
        for b in range(2):
            np.testing.assert_array_equal(got[b], oracles.fps_oracle(pts[b], 32))

    def test_first_index_zero(self, rng):
        pts = make_cloud(rng)
        got = np.asarray(ops.furthest_point_sample(pts[None], 16, use_pallas=False))[0]
        assert got[0] == 0

    def test_near_origin_never_selected(self, rng):
        pts = make_cloud(rng, n=100, near_origin=30)
        got = np.asarray(ops.furthest_point_sample(pts[None], 50, use_pallas=False))[0]
        mag = np.sum(pts**2, axis=1)
        assert np.all(mag[got[1:]] > 1e-3)

    def test_pallas_interpret_matches(self, rng):
        from graspnet_tpu.ops.pallas.fps import fps_pallas
        import jax
        from jax.experimental.pallas import tpu as pltpu

        pts = np.stack([make_cloud(rng), make_cloud(rng)])
        want = np.asarray(ops.furthest_point_sample(pts, 32, use_pallas=False))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fps_pallas(jnp.asarray(pts), 32))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.slow
    def test_chain_interpret_matches(self, rng):
        from graspnet_tpu.ops.pallas.fps import fps_chain_pallas
        from jax.experimental.pallas import tpu as pltpu

        npoints = (256, 128, 64)
        pts = np.stack(
            [make_cloud(rng, n=700), make_cloud(rng, n=700, near_origin=60)]
        )
        # oracle: sequential FPS + gather per stage
        want, cur = [], pts
        for m in npoints:
            inds = np.asarray(ops.furthest_point_sample(cur, m, use_pallas=False))
            want.append(inds)
            cur = np.take_along_axis(cur, inds[..., None], axis=1)
        with pltpu.force_tpu_interpret_mode():
            got = fps_chain_pallas(jnp.asarray(pts), npoints)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), w)


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.04, 64), (0.1, 32), (0.3, 16)])
    def test_matches_oracle(self, rng, radius, nsample):
        pts = make_cloud(rng, n=400)
        centers = pts[rng.choice(400, 64, replace=False)]
        want = oracles.ball_query_oracle(pts, centers, radius, nsample)
        got = np.asarray(
            ops.ball_query(pts[None], centers[None], radius, nsample, chunk=32)
        )[0]
        np.testing.assert_array_equal(got, want)

    def test_empty_rows_zero(self, rng):
        pts = make_cloud(rng, n=100)
        centers = np.full((4, 3), 10.0, dtype=np.float32)  # far away: no hits
        got = np.asarray(ops.ball_query(pts[None], centers[None], 0.05, 8))[0]
        np.testing.assert_array_equal(got, np.zeros((4, 8), np.int32))


class TestCylinderQuery:
    def test_matches_oracle(self, rng):
        pts = make_cloud(rng, n=300)
        centers = pts[rng.choice(300, 32, replace=False)]
        # random valid rotation matrices via QR
        A = rng.normal(size=(32, 3, 3))
        rot = np.linalg.qr(A)[0].astype(np.float32)
        want = oracles.cylinder_query_oracle(
            pts, centers, rot, 0.05, -0.02, 0.04, 16
        )
        got = np.asarray(
            ops.cylinder_query(
                pts[None], centers[None], rot[None], 0.05, -0.02, 0.04, 16, chunk=16
            )
        )[0]
        np.testing.assert_array_equal(got, want)


class TestKNN:
    def test_three_nn_matches_oracle(self, rng):
        unknown = make_cloud(rng, n=128)
        known = make_cloud(rng, n=64)
        want_d, want_i = oracles.three_nn_oracle(unknown, known)
        got_d, got_i = ops.three_nn(unknown[None], known[None])
        np.testing.assert_array_equal(np.asarray(got_i)[0], want_i)
        np.testing.assert_allclose(np.asarray(got_d)[0], want_d, rtol=1e-6)

    def test_knn_matches_oracle(self, rng):
        ref = make_cloud(rng, n=100)
        query = make_cloud(rng, n=50)
        want = oracles.knn_oracle(ref, query, 4)
        got = np.asarray(ops.knn(ref[None], query[None], 4))[0]
        np.testing.assert_array_equal(got, want)


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 9)).astype(np.int32)
        got = np.asarray(ops.gather_points(pts, idx))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group(self, rng):
        pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
        idx = rng.integers(0, 50, size=(2, 9, 4)).astype(np.int32)
        got = np.asarray(ops.group_points(pts, idx))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_three_interpolate(self, rng):
        feats = rng.normal(size=(1, 20, 8)).astype(np.float32)
        idx = rng.integers(0, 20, size=(1, 30, 3)).astype(np.int32)
        w = rng.uniform(size=(1, 30, 3)).astype(np.float32)
        got = np.asarray(ops.three_interpolate(feats, idx, w))
        want = np.einsum("nkc,nk->nc", feats[0][idx[0]], w[0])
        np.testing.assert_allclose(got[0], want, rtol=1e-6)


# ---------------------------------------------------------------------------
# MXU scatter-add backward (ops/scatter.py custom VJPs)
# ---------------------------------------------------------------------------


def _autodiff_gather_grads(points, idx, g):
    """Oracle: plain take_along_axis autodiff (XLA scatter backward)."""
    def f(p):
        b, m, s = idx.shape
        flat = jnp.take_along_axis(p, idx.reshape(b, m * s, 1), axis=1)
        return jnp.sum(flat.reshape(b, m, s, p.shape[-1]) * g)

    return jax.grad(f)(points)


def test_group_points_backward_matches_autodiff():
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(2, 64, 8)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 64, size=(2, 10, 5)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(2, 10, 5, 8)), jnp.float32)

    def f(p):
        return jnp.sum(ops.group_points(p, idx) * g)

    got = jax.grad(f)(points)
    want = _autodiff_gather_grads(points, idx, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_group_points_backward_chunked():
    # force the lax.scan chunking path: K large relative to the 8M budget
    rng = np.random.default_rng(1)
    n = 4096
    points = jnp.asarray(rng.normal(size=(1, n, 4)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, n, size=(1, 300, 16)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(1, 300, 16, 4)), jnp.float32)

    def f(p):
        return jnp.sum(ops.group_points(p, idx) * g)

    got = jax.grad(f)(points)
    want = _autodiff_gather_grads(points, idx, g)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_gather_points_backward_matches_autodiff():
    rng = np.random.default_rng(2)
    points = jnp.asarray(rng.normal(size=(2, 40, 6)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 40, size=(2, 17)), jnp.int32)
    g = jnp.asarray(rng.normal(size=(2, 17, 6)), jnp.float32)

    def f(p):
        return jnp.sum(ops.gather_points(p, idx) * g)

    def oracle(p):
        return jnp.sum(jnp.take_along_axis(p, idx[..., None], axis=1) * g)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f)(points)),
        np.asarray(jax.grad(oracle)(points)),
        atol=1e-5,
    )


def test_three_interpolate_backward_matches_autodiff():
    rng = np.random.default_rng(3)
    feat = jnp.asarray(rng.normal(size=(2, 30, 5)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 30, size=(2, 12, 3)), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, size=(2, 12, 3)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(2, 12, 5)), jnp.float32)

    def oracle(feats, ww):
        b, n, _ = idx.shape
        gathered = jnp.take_along_axis(
            feats, idx.reshape(b, n * 3, 1), axis=1
        ).reshape(b, n, 3, feats.shape[-1])
        return jnp.sum(jnp.sum(gathered * ww[..., None], axis=2) * g)

    def f(feats, ww):
        return jnp.sum(ops.three_interpolate(feats, idx, ww) * g)

    got = jax.grad(f, argnums=(0, 1))(feat, w)
    want = jax.grad(oracle, argnums=(0, 1))(feat, w)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
