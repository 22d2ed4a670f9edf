"""Fused CloudCrop kernel parity vs the unfused eval path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import heads
from graspnet_tpu.nn import layers as nn
from graspnet_tpu.ops.pallas.crop import crop_fused_pallas, fold_bn_eval


@pytest.fixture(scope="module")
def setup():
    cfg = GraspNetConfig.tiny()
    rng = np.random.default_rng(0)
    params = {"mlp": nn.shared_mlp_init(jax.random.PRNGKey(0), cfg.crop_mlp)}
    for l in params["mlp"]:  # non-trivial BN stats so folding is exercised
        for k, lo, hi in (("mean", -0.1, 0.1), ("var", 0.5, 2.0),
                          ("scale", 0.5, 1.5), ("offset", -0.1, 0.1)):
            l["bn"][k] = jnp.asarray(
                rng.uniform(lo, hi, l["bn"][k].shape), jnp.float32
            )
    b, n, m = 2, cfg.num_point, cfg.num_seed
    xyz = jnp.asarray(rng.uniform(-0.3, 0.3, (b, n, 3)), jnp.float32)
    seeds = jnp.asarray(
        np.asarray(xyz[:, :m]) + rng.normal(0, 0.005, (b, m, 3)).astype(np.float32)
    )
    q, _ = np.linalg.qr(rng.normal(size=(b, m, 3, 3)))
    return cfg, params, xyz, seeds, jnp.asarray(q, jnp.float32)


def test_fold_bn_eval_matches_layers(setup):
    cfg, params, *_ = setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (5, cfg.crop_mlp[0])), jnp.float32)
    ref, _ = nn.shared_mlp(params["mlp"], x, train=False, eps=cfg.bn_eps)
    h = x
    for w, b in fold_bn_eval(params["mlp"], cfg.bn_eps):
        h = jax.nn.relu(h @ w + b[0])
    np.testing.assert_allclose(np.asarray(ref), np.asarray(h), atol=1e-5)


@pytest.mark.slow
def test_fused_crop_matches_unfused(setup):
    cfg, params, xyz, seeds, rot = setup
    ref, _ = heads.crop_forward(params, seeds, xyz, rot, cfg, train=False)
    folded = fold_bn_eval(params["mlp"], cfg.bn_eps)
    fw = tuple(x for pair in folded for x in pair)
    got = crop_fused_pallas(
        xyz, seeds, rot, fw,
        cfg.cylinder_radius, cfg.hmin, tuple(cfg.hmax_list), cfg.crop_nsample,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_fused_crop_empty_seed(setup):
    """A seed far outside the cloud must reproduce the all-index-0 crop."""
    cfg, params, xyz, seeds, rot = setup
    far = jnp.full_like(seeds, 10.0)
    ref, _ = heads.crop_forward(params, far, xyz, rot, cfg, train=False)
    folded = fold_bn_eval(params["mlp"], cfg.bn_eps)
    fw = tuple(x for pair in folded for x in pair)
    got = crop_fused_pallas(
        xyz, far, rot, fw,
        cfg.cylinder_radius, cfg.hmin, tuple(cfg.hmax_list), cfg.crop_nsample,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def _grouped_xla(cfg, xyz, seeds, rot):
    """The unfused train-path grouping: query -> gather -> subtract -> rotate."""
    from graspnet_tpu import ops
    from graspnet_tpu.models.heads import cylinder_query_multi_depth

    idx = cylinder_query_multi_depth(
        xyz, seeds, rot, cfg.cylinder_radius, cfg.hmin, cfg.hmax_list,
        cfg.crop_nsample,
    )
    b, ns, nd, s = idx.shape
    grouped = ops.group_points(xyz, idx.reshape(b, ns * nd, s))
    grouped = grouped.reshape(b, ns, nd, s, 3) - np.asarray(seeds)[:, :, None, None, :]
    return jnp.einsum("bndsi,bnij->bndsj", grouped, rot)


class TestCropGroupKernel:
    """crop_group_pallas (train-path fused query+gather+rotate) parity."""

    def test_matches_unfused_grouping(self, setup):
        from graspnet_tpu.ops.pallas.crop import crop_group_pallas

        cfg, _, xyz, seeds, rot = setup
        ref = _grouped_xla(cfg, xyz, seeds, rot)
        got = crop_group_pallas(
            xyz, seeds, rot, cfg.cylinder_radius, cfg.hmin,
            tuple(cfg.hmax_list), cfg.crop_nsample,
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)

    def test_empty_seed_padding(self, setup):
        from graspnet_tpu.ops.pallas.crop import crop_group_pallas

        cfg, _, xyz, _, rot = setup
        far = jnp.full((xyz.shape[0], rot.shape[1], 3), 10.0, jnp.float32)
        ref = _grouped_xla(cfg, xyz, far, rot)
        got = crop_group_pallas(
            xyz, far, rot, cfg.cylinder_radius, cfg.hmin,
            tuple(cfg.hmax_list), cfg.crop_nsample,
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-6)

    def test_stop_gradient(self, setup):
        """Differentiating through the kernel yields zeros, never an error."""
        from graspnet_tpu.ops.pallas.crop import crop_group_pallas

        cfg, _, xyz, seeds, rot = setup

        def f(s):
            return jnp.sum(
                crop_group_pallas(
                    xyz, s, rot, cfg.cylinder_radius, cfg.hmin,
                    tuple(cfg.hmax_list), cfg.crop_nsample,
                )
            )

        g = jax.grad(f)(seeds)
        np.testing.assert_array_equal(np.asarray(g), 0.0)

    @pytest.mark.slow
    def test_train_mlp_on_fused_grouping(self, setup):
        """shared_mlp(train=True) over kernel vs XLA grouping: same features
        AND batch stats (the full train crop path modulo the dispatch gate)."""
        cfg, params, xyz, seeds, rot = setup
        from graspnet_tpu.ops.pallas.crop import crop_group_pallas

        ref_g = _grouped_xla(cfg, xyz, seeds, rot)
        got_g = crop_group_pallas(
            xyz, seeds, rot, cfg.cylinder_radius, cfg.hmin,
            tuple(cfg.hmax_list), cfg.crop_nsample,
        )
        ref, ref_stats = nn.shared_mlp(
            params["mlp"], ref_g, train=True, eps=cfg.bn_eps
        )
        got, got_stats = nn.shared_mlp(
            params["mlp"], got_g, train=True, eps=cfg.bn_eps
        )
        np.testing.assert_allclose(
            np.asarray(jnp.max(ref, axis=3)), np.asarray(jnp.max(got, axis=3)),
            atol=1e-5,
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(ref_stats),
            jax.tree_util.tree_leaves(got_stats),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestFusedSAStages:
    def _bn_randomize(self, layers, rng):
        import jax.numpy as jnp

        for l in layers:
            l["bn"]["mean"] = jnp.asarray(
                rng.normal(0, 0.1, l["bn"]["mean"].shape), jnp.float32
            )
            l["bn"]["var"] = jnp.asarray(
                rng.uniform(0.5, 2.0, l["bn"]["var"].shape), jnp.float32
            )

    @pytest.mark.slow
    def test_sa1_fused_matches(self):
        from graspnet_tpu.models.backbone import _sa_stage
        from graspnet_tpu.ops.pallas.crop import sa1_fused_pallas

        cfg = GraspNetConfig.tiny()
        rng = np.random.default_rng(0)
        params = {"mlp": nn.shared_mlp_init(jax.random.PRNGKey(0), cfg.sa1.mlp)}
        self._bn_randomize(params["mlp"], rng)
        xyz = jnp.asarray(rng.uniform(-0.3, 0.3, (2, cfg.num_point, 3)), jnp.float32)
        new_xyz, ref, _, _, _ = _sa_stage(
            params, cfg.sa1, xyz, None, train=False, eps=cfg.bn_eps
        )
        got = sa1_fused_pallas(
            xyz, new_xyz, params["mlp"], cfg.sa1.radius, cfg.sa1.nsample, cfg.bn_eps
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    def test_sa_feat_fused_matches(self):
        from graspnet_tpu.models.backbone import _sa_stage
        from graspnet_tpu.ops.pallas.crop import sa_feat_fused_pallas

        cfg = GraspNetConfig.tiny()
        rng = np.random.default_rng(1)
        params = {"mlp": nn.shared_mlp_init(jax.random.PRNGKey(1), cfg.sa2.mlp)}
        self._bn_randomize(params["mlp"], rng)
        n, c = cfg.sa1.npoint, cfg.sa1.mlp[-1]
        xyz = jnp.asarray(rng.uniform(-0.3, 0.3, (2, n, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(0, 1, (2, n, c)), jnp.float32)
        new_xyz, ref, _, _, _ = _sa_stage(
            params, cfg.sa2, xyz, feats, train=False, eps=cfg.bn_eps
        )
        got = sa_feat_fused_pallas(
            xyz, new_xyz, feats, params["mlp"],
            cfg.sa2.radius, cfg.sa2.nsample, cfg.bn_eps,
        )
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)
