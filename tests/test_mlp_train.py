"""Parity tests for the fused batch-stats SharedMLP+pool train kernel.

ops/pallas/mlp_train.py vs the XLA path (nn.shared_mlp train=True followed
by jnp.max over samples): pooled values, batch statistics, and every
parameter gradient must agree at f32 tolerance.  On CPU the kernel runs in
interpret mode; the same programs compile on TPU (driven by
scripts/crop_train_breakdown.py, artifact perf/crop_train_breakdown_r3.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graspnet_tpu.nn import layers as nn
from graspnet_tpu.ops.pallas.mlp_train import crop_mlp_train_pallas

EPS = 1e-5


def make_layers(dims=(3, 8, 16, 32), seed=1, negative_gamma=True):
    layers = nn.shared_mlp_init(jax.random.PRNGKey(seed), dims)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), 2 * len(layers))
    for i, l in enumerate(layers):
        l["bn"]["scale"] = 1.0 + 0.3 * jax.random.normal(
            keys[2 * i], l["bn"]["scale"].shape
        )
        l["bn"]["offset"] = 0.2 * jax.random.normal(
            keys[2 * i + 1], l["bn"]["offset"].shape
        )
    if negative_gamma:
        # exercise the min-pool branch of the affine-after-pool trick
        layers[-1]["bn"]["scale"] = layers[-1]["bn"]["scale"].at[0].set(-0.7)
    return layers


def make_grouped(rng, b=2, m=8, d=4, s=8, with_ties=True):
    g = jnp.asarray(rng.uniform(-0.05, 0.05, (b, m, d, s, 3)), jnp.float32)
    if with_ties:
        # duplicate rows = the reference's first-hit padding: creates exact
        # pool ties, which the backward must split like jnp.max's VJP
        g = g.at[:, :, :, 1].set(g[:, :, :, 0])
    return g


def xla_path(layers, grouped):
    out, stats = nn.shared_mlp(layers, grouped, train=True, eps=EPS)
    return jnp.max(out, axis=3), stats


class TestForward:
    def test_pooled_and_stats_match_xla(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng)
        p_ref, st_ref = xla_path(layers, grouped)
        p_got, st_got = crop_mlp_train_pallas(layers, grouped, EPS)
        scale = float(jnp.max(jnp.abs(p_ref)))
        np.testing.assert_allclose(p_got, p_ref, atol=2e-5 * max(scale, 1.0))
        for a, b in zip(st_ref, st_got):
            np.testing.assert_allclose(b["mean"], a["mean"], atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(b["var"], a["var"], atol=1e-5, rtol=1e-5)

    def test_stats_are_unbiased_like_torch(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng, with_ties=False)
        _, st = crop_mlp_train_pallas(layers, grouped, EPS)
        # recompute layer-1 stats directly: z1 = x @ W1
        x = np.asarray(grouped).reshape(-1, 3)
        z1 = x @ np.asarray(layers[0]["kernel"])
        np.testing.assert_allclose(st[0]["mean"], z1.mean(0), atol=1e-6)
        np.testing.assert_allclose(st[0]["var"], z1.var(0, ddof=1), rtol=1e-4)

    def test_odd_seed_count_falls_back_to_sb1(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng, m=7)  # 7 % 4 != 0, 7 % 2 != 0
        p_ref, _ = xla_path(layers, grouped)
        p_got, _ = crop_mlp_train_pallas(layers, grouped, EPS)
        np.testing.assert_allclose(p_got, p_ref, atol=2e-5)


class TestBackward:
    def _grads(self, f, layers, grouped, w):
        def loss(layers):
            p, _ = f(layers, grouped)
            return jnp.sum(p * w)

        return jax.grad(loss)(layers)

    def test_all_param_grads_match_xla(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng)
        w = jax.random.normal(jax.random.PRNGKey(5), (2, 8, 4, 32))
        g_ref = self._grads(xla_path, layers, grouped, w)
        g_got = self._grads(
            lambda l, g: crop_mlp_train_pallas(l, g, EPS), layers, grouped, w
        )
        ref_leaves = jax.tree_util.tree_flatten_with_path(g_ref)[0]
        got_leaves = jax.tree_util.tree_flatten_with_path(g_got)[0]
        assert len(ref_leaves) == len(got_leaves)
        for (path, a), (_, b) in zip(ref_leaves, got_leaves):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(
                b, a, atol=2e-4 * scale,
                err_msg=jax.tree_util.keystr(path),
            )

    def test_running_stats_get_zero_grads(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng)
        w = jnp.ones((2, 8, 4, 32))
        g = self._grads(
            lambda l, gg: crop_mlp_train_pallas(l, gg, EPS), layers, grouped, w
        )
        for layer in g:
            assert float(jnp.max(jnp.abs(layer["bn"]["mean"]))) == 0.0
            assert float(jnp.max(jnp.abs(layer["bn"]["var"]))) == 0.0

    def test_grouped_gets_zero_cotangent(self, rng):
        layers = make_layers()
        grouped = make_grouped(rng)

        def loss(g):
            p, _ = crop_mlp_train_pallas(layers, g, EPS)
            return jnp.sum(p)

        dg = jax.grad(loss)(grouped)
        assert float(jnp.max(jnp.abs(dg))) == 0.0

    def test_pool_tie_split_matches_xla(self, rng):
        """All-identical sample rows: gradient splits evenly across the
        pool group exactly like jnp.max's VJP."""
        layers = make_layers(negative_gamma=False)
        g0 = make_grouped(rng, s=4, with_ties=False)
        grouped = g0.at[:, :, :, 1:].set(g0[:, :, :, 0:1])  # 4-way ties
        w = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 4, 32))
        g_ref = self._grads(xla_path, layers, grouped, w)
        g_got = self._grads(
            lambda l, g: crop_mlp_train_pallas(l, g, EPS), layers, grouped, w
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_got)
        ):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(b, a, atol=2e-4 * scale)


class TestTrainerIntegration:
    def test_crop_forward_xla_path_unchanged_on_cpu(self, rng):
        """On the CPU backend crop_forward(train=True) must keep the XLA
        path (the fused kernel is TPU-gated; GSPMD sync-BN relies on it)."""
        from graspnet_tpu.config import GraspNetConfig
        from graspnet_tpu.models import heads

        cfg = GraspNetConfig.tiny()
        params = heads.init_crop(jax.random.PRNGKey(0), cfg)
        cloud = jnp.asarray(
            rng.uniform(-0.3, 0.3, (1, cfg.num_point, 3)), jnp.float32
        )
        seeds = cloud[:, : cfg.num_seed]
        rots = jnp.tile(jnp.eye(3, dtype=jnp.float32), (1, cfg.num_seed, 1, 1))
        pooled, stats = heads.crop_forward(
            params, seeds, cloud, rots, cfg, train=True
        )
        assert pooled.shape == (1, cfg.num_seed, cfg.num_depth, cfg.crop_mlp[-1])
        assert stats is not None and len(stats) == len(cfg.crop_mlp) - 1


class TestSA1Shape:
    """The sa1 TRAIN stage reuses the crop kernel at D=1 with the backbone's
    [3, 64, 64, 128] channel plan (models/backbone.py::_sa_stage, round 4);
    pin forward + grads at an sa1-shaped configuration."""

    def test_sa1_d1_forward_matches_xla(self, rng):
        layers = make_layers(dims=(3, 8, 8, 16))
        grouped = make_grouped(rng, b=2, m=16, d=1, s=8)
        p_ref, st_ref = xla_path(layers, grouped)
        p_got, st_got = crop_mlp_train_pallas(layers, grouped, EPS)
        scale = float(jnp.max(jnp.abs(p_ref)))
        np.testing.assert_allclose(p_got, p_ref, atol=2e-5 * max(scale, 1.0))
        for a, b in zip(st_ref, st_got):
            np.testing.assert_allclose(b["mean"], a["mean"], atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(b["var"], a["var"], atol=1e-5, rtol=1e-5)

    def test_sa1_d1_grads_match_xla(self, rng):
        layers = make_layers(dims=(3, 8, 8, 16))
        grouped = make_grouped(rng, b=2, m=16, d=1, s=8)
        w = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 1, 16))

        def grads(path_fn):
            def loss(l):
                p, _ = path_fn(l, grouped)
                return jnp.sum(p * w)

            return jax.grad(loss)(layers)

        g_ref = grads(xla_path)
        g_got = grads(lambda l, g: crop_mlp_train_pallas(l, g, EPS))
        ref_leaves = jax.tree_util.tree_flatten_with_path(g_ref)[0]
        got_leaves = jax.tree_util.tree_flatten_with_path(g_got)[0]
        for (path, a), (_, b) in zip(ref_leaves, got_leaves):
            scale = max(float(jnp.max(jnp.abs(a))), 1.0)
            np.testing.assert_allclose(
                b, a, atol=2e-4 * scale, err_msg=jax.tree_util.keystr(path)
            )
