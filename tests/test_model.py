"""Model forward + decode contract tests on the tiny config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import init_graspnet, graspnet_forward, pred_decode


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = GraspNetConfig.tiny()
    params = init_graspnet(jax.random.PRNGKey(0), cfg)
    cloud = jax.random.uniform(
        jax.random.PRNGKey(1), (2, cfg.num_point, 3), minval=-0.5, maxval=0.5
    )
    return cfg, params, cloud


class TestForward:
    @pytest.mark.slow
    def test_shapes(self, tiny_setup):
        cfg, params, cloud = tiny_setup
        ep = graspnet_forward(params, cloud, cfg, train=False)
        b, ns = 2, cfg.num_seed
        assert ep["fp2_features"].shape == (b, ns, cfg.seed_feature_dim)
        assert ep["fp2_xyz"].shape == (b, ns, 3)
        assert ep["fp2_inds"].shape == (b, ns)
        assert ep["objectness_score"].shape == (b, ns, 2)
        assert ep["view_score"].shape == (b, ns, cfg.num_view)
        assert ep["grasp_top_view_rot"].shape == (b, ns, 3, 3)
        assert ep["grasp_score_pred"].shape == (b, ns, cfg.num_angle, cfg.num_depth)
        assert ep["grasp_angle_cls_pred"].shape == (b, ns, cfg.num_angle, cfg.num_depth)
        assert ep["grasp_width_pred"].shape == (b, ns, cfg.num_angle, cfg.num_depth)
        assert ep["grasp_tolerance_pred"].shape == (b, ns, cfg.num_angle, cfg.num_depth)

    @pytest.mark.slow
    def test_jit_forward(self, tiny_setup):
        cfg, params, cloud = tiny_setup
        fwd = jax.jit(lambda p, x: graspnet_forward(p, x, cfg, train=False))
        ep = fwd(params, cloud)
        assert np.all(np.isfinite(np.asarray(ep["grasp_score_pred"])))

    def test_seed_inds_consistent(self, tiny_setup):
        """fp2_xyz must equal input points gathered at fp2_inds (backbone contract)."""
        cfg, params, cloud = tiny_setup
        ep = graspnet_forward(params, cloud, cfg, train=False)
        inds = np.asarray(ep["fp2_inds"])
        got = np.take_along_axis(np.asarray(cloud), inds[..., None], axis=1)
        np.testing.assert_allclose(got, np.asarray(ep["fp2_xyz"]), atol=1e-6)


class TestDecode:
    def test_decode_matches_reference_logic(self, tiny_setup, rng):
        """pred_decode vs a direct numpy transcription of graspnet.py:77-134."""
        cfg, params, cloud = tiny_setup
        ep = graspnet_forward(params, cloud, cfg, train=False)
        grasps, valid = jax.jit(lambda e: pred_decode(e, cfg))(ep)
        grasps, valid = np.asarray(grasps), np.asarray(valid)

        b, ns = valid.shape
        for i in range(b):
            score = np.asarray(ep["grasp_score_pred"][i])  # (Ns, A, D)
            angle_cls = np.asarray(ep["grasp_angle_cls_pred"][i])
            width = np.clip(
                cfg.width_scale * np.asarray(ep["grasp_width_pred"][i]),
                0,
                cfg.grasp_max_width,
            )
            tol = np.asarray(ep["grasp_tolerance_pred"][i])
            ai = np.argmax(angle_cls, axis=1)  # (Ns, D)
            sc = np.take_along_axis(score, ai[:, None, :], axis=1)[:, 0, :]
            wd = np.take_along_axis(width, ai[:, None, :], axis=1)[:, 0, :]
            tl = np.take_along_axis(tol, ai[:, None, :], axis=1)[:, 0, :]
            di = np.argmax(sc, axis=1)  # (Ns,)
            sc = np.take_along_axis(sc, di[:, None], axis=1)[:, 0]
            wd = np.take_along_axis(wd, di[:, None], axis=1)[:, 0]
            tl = np.take_along_axis(tl, di[:, None], axis=1)[:, 0]
            ang = np.take_along_axis(
                ai.astype(np.float32) / cfg.num_angle * np.pi, di[:, None], axis=1
            )[:, 0]
            depth = (di + 1) * cfg.depth_unit
            obj = np.argmax(np.asarray(ep["objectness_score"][i]), axis=1) == 1
            final_score = sc * tl / cfg.grasp_max_tolerance

            np.testing.assert_array_equal(valid[i], obj)
            np.testing.assert_allclose(grasps[i, :, 0], final_score, atol=1e-5)
            np.testing.assert_allclose(grasps[i, :, 1], wd, atol=1e-6)
            np.testing.assert_allclose(grasps[i, :, 2], cfg.grasp_height, atol=1e-7)
            np.testing.assert_allclose(grasps[i, :, 3], depth, atol=1e-6)
            np.testing.assert_allclose(
                grasps[i, :, 13:16], np.asarray(ep["fp2_xyz"][i]), atol=1e-6
            )
            np.testing.assert_array_equal(grasps[i, :, 16], -1.0)
            # rotation column check: R x-axis == approach direction
            approaching = -np.asarray(ep["grasp_top_view_xyz"][i])
            approaching /= np.linalg.norm(approaching, axis=-1, keepdims=True)
            R = grasps[i, :, 4:13].reshape(ns, 3, 3)
            np.testing.assert_allclose(R[:, :, 0], approaching, atol=1e-5)
