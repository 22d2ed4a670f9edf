"""Tests for the MSG set-abstraction / LFP module library (models/msg.py).

Reference semantics: pointnet2/pointnet2_modules.py:78-162 (SA MSG),
274-353 (Votes variant: inds in/out), 418-497 (LFP), pointnet2_utils.py:
375-421 (GroupAll).
"""

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu import ops
from graspnet_tpu.models import msg
from graspnet_tpu.nn import layers as nn


def _data(b=2, n=64, c=7, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(-0.5, 0.5, (b, n, 3)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(b, n, c)), jnp.float32)
    return xyz, feat


def test_sa_msg_shapes_and_scale_concat():
    xyz, feat = _data()
    params = msg.init_sa_msg(
        jax.random.PRNGKey(0), [(8, 16), (8, 32)], in_dim=7
    )
    new_xyz, out, inds, _ = msg.sa_msg_forward(
        params, xyz, feat,
        npoint=16, radii=(0.2, 0.4), nsamples=(8, 16),
    )
    assert new_xyz.shape == (2, 16, 3)
    assert out.shape == (2, 16, 16 + 32)  # per-scale outputs concatenated
    assert inds.shape == (2, 16)


def test_sa_msg_single_scale_matches_manual_compose():
    """One scale == ball_query -> group -> center-subtract -> MLP -> pool."""
    xyz, feat = _data(seed=1)
    params = msg.init_sa_msg(jax.random.PRNGKey(1), [(8, 16)], in_dim=7)
    inds = ops.furthest_point_sample(xyz, 16)
    new_xyz, out, _, _ = msg.sa_msg_forward(
        params, xyz, feat, npoint=16, radii=(0.3,), nsamples=(8,), inds=inds
    )
    # manual
    centers = ops.gather_points(xyz, inds)
    idx = ops.ball_query(xyz, centers, 0.3, 8)
    grouped = jnp.concatenate(
        [
            ops.group_points(xyz, idx) - centers[:, :, None, :],
            ops.group_points(feat, idx),
        ],
        axis=-1,
    )
    want, _ = nn.shared_mlp(params["mlps"][0], grouped)
    want = jnp.max(want, axis=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_xyz), np.asarray(centers))


def test_sa_msg_votes_inds_passthrough():
    """PointnetSAModuleMSGVotes contract: given inds are used and returned."""
    xyz, feat = _data(seed=2)
    params = msg.init_sa_msg(jax.random.PRNGKey(2), [(8,)], in_dim=7)
    my_inds = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None], (2, 1))
    new_xyz, _, inds_out, _ = msg.sa_msg_forward(
        params, xyz, feat, npoint=16, radii=(0.3,), nsamples=(4,), inds=my_inds
    )
    np.testing.assert_array_equal(np.asarray(inds_out), np.asarray(my_inds))
    np.testing.assert_allclose(
        np.asarray(new_xyz), np.asarray(xyz[:, :16]), atol=0
    )


def test_sa_msg_group_all():
    """npoint=None == GroupAll: one group over every point."""
    xyz, feat = _data(seed=3)
    params = msg.init_sa_msg(jax.random.PRNGKey(3), [(8, 16)], in_dim=7)
    new_xyz, out, inds, _ = msg.sa_msg_forward(
        params, xyz, feat, npoint=None, radii=(), nsamples=()
    )
    assert new_xyz is None and inds is None
    assert out.shape == (2, 1, 16)
    # equals MLP over [xyz | feat] then max over all N
    grouped = jnp.concatenate([xyz, feat], axis=-1)[:, None]
    want, _ = nn.shared_mlp(params["mlps"][0], grouped)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.max(want, axis=2)), atol=1e-6
    )


def test_sa_msg_train_returns_stats_and_grads_flow():
    xyz, feat = _data(seed=4)
    params = msg.init_sa_msg(jax.random.PRNGKey(4), [(8,), (8,)], in_dim=7)

    def loss(p):
        _, out, _, stats = msg.sa_msg_forward(
            p, xyz, feat, npoint=8, radii=(0.2, 0.5), nsamples=(4, 8),
            train=True,
        )
        assert stats is not None and len(stats) == 2
        return jnp.sum(out)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert any(nm > 0 for nm in norms)


def test_lfp_msg_shapes_and_skip_concat():
    xyz1, feat1 = _data(b=2, n=64, c=5, seed=5)
    xyz2, feat2 = _data(b=2, n=24, c=6, seed=6)
    params = msg.init_lfp_msg(
        jax.random.PRNGKey(5), [(8, 16)], (12,), in_dim=5, skip_dim=6
    )
    out, _ = msg.lfp_msg_forward(
        params, xyz2, xyz1, feat2, feat1, radii=(0.4,), nsamples=(8,)
    )
    assert out.shape == (2, 24, 12)

    # skip features enter before the post MLP: zeroing them changes output
    out0, _ = msg.lfp_msg_forward(
        params, xyz2, xyz1, jnp.zeros_like(feat2), feat1,
        radii=(0.4,), nsamples=(8,),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out0))
