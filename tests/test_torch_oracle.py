"""End-to-end torch oracle for the converted backbone.

test_nn.py pins single layers against torch and test_checkpoint.py pins the
converter's name/shape mapping; this test closes the remaining gap — the
COMPOSITION.  A synthetic reference state dict is converted with
checkpoint.convert_torch_state_dict, then the full SA x4 + FP x2 backbone is
evaluated both by backbone_forward and by a literal torch transcription of
the reference modules (Conv2d 1x1 + eval BatchNorm + ReLU + maxpool;
PointnetSAModuleVotes / PointnetFPModule semantics, reference
pointnet2_modules.py:164-272,356-416) fed the SAME sampling/grouping indices.
A transposed kernel, swapped concat order, wrong BN stat, or misrouted skip
connection anywhere in the stack fails this test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspnet_tpu import checkpoint, ops
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models.backbone import backbone_forward

from tests.test_checkpoint import make_reference_state_dict

torch = pytest.importorskip("torch")


def _gather(points, idx):
    """points (B, N, C), idx (B, ...) -> (B, ..., C) numpy gather."""
    b = points.shape[0]
    return np.stack([points[i][idx[i]] for i in range(b)])


def _torch_mlp2d(sd, prefix, x, nlayers, training=False):
    """x (B, C, M, ns) through the reference SharedMLP (conv+bn+relu)."""
    import torch.nn.functional as tf

    for i in range(nlayers):
        p = f"{prefix}.layer{i}"
        x = tf.conv2d(x, sd[f"{p}.conv.weight"])
        x = tf.batch_norm(
            x,
            sd[f"{p}.bn.bn.running_mean"].clone(),
            sd[f"{p}.bn.bn.running_var"].clone(),
            sd[f"{p}.bn.bn.weight"],
            sd[f"{p}.bn.bn.bias"],
            training=training,
            eps=1e-5,
        )
        x = tf.relu(x)
    return x


def _torch_sa(sd, prefix, xyz, feats, inds, radius, nsample, nlayers, training=False):
    """Reference PointnetSAModuleVotes (normalize_xyz=True) on shared inds."""
    idx = np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(_gather(xyz, inds)), radius, nsample))
    new_xyz = _gather(xyz, inds)
    grouped_xyz = (_gather(xyz, idx.reshape(idx.shape[0], -1)).reshape(idx.shape + (3,)) - new_xyz[:, :, None, :]) / radius
    cols = [grouped_xyz]
    if feats is not None:
        cols.append(_gather(feats, idx.reshape(idx.shape[0], -1)).reshape(idx.shape + (feats.shape[-1],)))
    grouped = np.concatenate(cols, axis=-1)  # (B, M, ns, C)
    t = torch.from_numpy(np.transpose(grouped, (0, 3, 1, 2)))  # (B, C, M, ns)
    t = _torch_mlp2d(sd, prefix, t, nlayers, training=training)
    pooled = t.max(dim=3).values  # (B, C, M)
    return new_xyz, np.transpose(pooled.numpy(), (0, 2, 1))


def _torch_fp(sd, prefix, unknown_xyz, known_xyz, unknown_feat, known_feat, nlayers, training=False):
    """Reference PointnetFPModule: 3-NN inverse-distance interp + skip + MLP."""
    dist, idx = ops.three_nn(jnp.asarray(unknown_xyz), jnp.asarray(known_xyz))
    dist, idx = np.asarray(dist), np.asarray(idx)
    recip = 1.0 / (dist + 1e-8)
    w = recip / recip.sum(axis=2, keepdims=True)  # (B, M, 3)
    nb = _gather(known_feat, idx.reshape(idx.shape[0], -1)).reshape(idx.shape + (known_feat.shape[-1],))
    interp = (nb * w[..., None]).sum(axis=2)  # (B, M, C)
    feat = np.concatenate([interp, unknown_feat], axis=-1)
    t = torch.from_numpy(np.transpose(feat, (0, 2, 1))[:, :, :, None])  # (B,C,M,1)
    t = _torch_mlp2d(sd, prefix, t, nlayers, training=training)
    return np.transpose(t[:, :, :, 0].numpy(), (0, 2, 1))


def torch_backbone(sd, cfg, cloud, sa_inds, training=False):
    """Full torch backbone on shared FPS indices -> (fp2_feat, seed_xyz)."""
    bb = "view_estimator.backbone"
    with torch.no_grad():
        xyz1, f1 = _torch_sa(sd, f"{bb}.sa1.mlp_module", cloud, None,
                             np.asarray(sa_inds["sa1"]), cfg.sa1.radius,
                             cfg.sa1.nsample, len(cfg.sa1.mlp) - 1, training)
        xyz2, f2 = _torch_sa(sd, f"{bb}.sa2.mlp_module", xyz1, f1,
                             np.asarray(sa_inds["sa2"]), cfg.sa2.radius,
                             cfg.sa2.nsample, len(cfg.sa2.mlp) - 1, training)
        xyz3, f3 = _torch_sa(sd, f"{bb}.sa3.mlp_module", xyz2, f2,
                             np.asarray(sa_inds["sa3"]), cfg.sa3.radius,
                             cfg.sa3.nsample, len(cfg.sa3.mlp) - 1, training)
        xyz4, f4 = _torch_sa(sd, f"{bb}.sa4.mlp_module", xyz3, f3,
                             np.asarray(sa_inds["sa4"]), cfg.sa4.radius,
                             cfg.sa4.nsample, len(cfg.sa4.mlp) - 1, training)
        fp1_t = _torch_fp(sd, f"{bb}.fp1.mlp", xyz3, xyz4, f3, f4,
                          len(cfg.fp1_mlp) - 1, training)
        fp2_t = _torch_fp(sd, f"{bb}.fp2.mlp", xyz2, xyz3, f2, fp1_t,
                          len(cfg.fp2_mlp) - 1, training)
    return fp2_t, xyz2


def test_converted_backbone_matches_torch_transcription(rng):
    cfg = GraspNetConfig.tiny()
    sd = make_reference_state_dict(cfg, rng)
    params = checkpoint.convert_torch_state_dict(sd)

    cloud = rng.uniform(-0.5, 0.5, (2, cfg.num_point, 3)).astype(np.float32)
    x = jnp.asarray(cloud)

    # shared FPS chain so both sides group identically
    sa_inds = {}
    cur = x
    for k, sa in (("sa1", cfg.sa1), ("sa2", cfg.sa2), ("sa3", cfg.sa3), ("sa4", cfg.sa4)):
        inds = ops.furthest_point_sample(cur, sa.npoint)
        sa_inds[k] = inds
        cur = ops.gather_points(cur, inds)

    fp2, seed_xyz, ep = backbone_forward(
        params["backbone"], x, cfg, train=False, sa_inds=sa_inds
    )
    fp2 = np.asarray(fp2)

    bb = "view_estimator.backbone"
    with torch.no_grad():
        xyz1, f1 = _torch_sa(sd, f"{bb}.sa1.mlp_module", cloud, None,
                             np.asarray(sa_inds["sa1"]), cfg.sa1.radius,
                             cfg.sa1.nsample, len(cfg.sa1.mlp) - 1)
        xyz2, f2 = _torch_sa(sd, f"{bb}.sa2.mlp_module", xyz1, f1,
                             np.asarray(sa_inds["sa2"]), cfg.sa2.radius,
                             cfg.sa2.nsample, len(cfg.sa2.mlp) - 1)
        xyz3, f3 = _torch_sa(sd, f"{bb}.sa3.mlp_module", xyz2, f2,
                             np.asarray(sa_inds["sa3"]), cfg.sa3.radius,
                             cfg.sa3.nsample, len(cfg.sa3.mlp) - 1)
        xyz4, f4 = _torch_sa(sd, f"{bb}.sa4.mlp_module", xyz3, f3,
                             np.asarray(sa_inds["sa4"]), cfg.sa4.radius,
                             cfg.sa4.nsample, len(cfg.sa4.mlp) - 1)
        fp1_t = _torch_fp(sd, f"{bb}.fp1.mlp", xyz3, xyz4, f3, f4,
                          len(cfg.fp1_mlp) - 1)
        fp2_t = _torch_fp(sd, f"{bb}.fp2.mlp", xyz2, xyz3, f2, fp1_t,
                          len(cfg.fp2_mlp) - 1)

    np.testing.assert_array_equal(np.asarray(seed_xyz), xyz2)
    np.testing.assert_allclose(fp2, fp2_t, atol=2e-5, rtol=1e-5)
