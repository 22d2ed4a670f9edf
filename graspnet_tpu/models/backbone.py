"""PointNet++ backbone: 4 set-abstraction stages + 2 feature-propagation stages.

TPU-first redesign of reference models/backbone.py + pointnet2_modules.py:
  * channels-last layout — the SharedMLP over (B, npoint, nsample, C) maps to
    MXU matmuls with nsample on the sublane axis;
  * all shapes static; the SA pipeline is FPS -> gather -> ball query ->
    group -> center/normalize -> MLP -> max-pool over samples
    (PointnetSAModuleVotes, pointnet2_modules.py:164-272);
  * FP stages are 3-NN inverse-distance interpolation + skip concat + MLP
    (PointnetFPModule, pointnet2_modules.py:356-416).

Output contract (reference backbone.py:78-131): 256-d features on the 1024
sa2 seeds; seed indices into the input cloud are sa1_inds[:, :1024].
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from graspnet_tpu import ops
from graspnet_tpu.config import GraspNetConfig, SAConfig
from graspnet_tpu.nn import layers as nn


def init_backbone(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    return {
        "sa1": {"mlp": nn.shared_mlp_init(ks[0], cfg.sa1.mlp)},
        "sa2": {"mlp": nn.shared_mlp_init(ks[1], cfg.sa2.mlp)},
        "sa3": {"mlp": nn.shared_mlp_init(ks[2], cfg.sa3.mlp)},
        "sa4": {"mlp": nn.shared_mlp_init(ks[3], cfg.sa4.mlp)},
        "fp1": {"mlp": nn.shared_mlp_init(ks[4], cfg.fp1_mlp)},
        "fp2": {"mlp": nn.shared_mlp_init(ks[5], cfg.fp2_mlp)},
    }


def _sa_stage(
    params: Dict[str, Any],
    sa: SAConfig,
    xyz: jax.Array,
    features: jax.Array | None,
    *,
    train: bool,
    eps: float,
    inds: jax.Array | None = None,
    qidx: jax.Array | None = None,
):
    """One set-abstraction stage.

    Args:
      xyz: (B, N, 3); features: (B, N, C) or None.
      inds: optional precomputed FPS indices (B, npoint) — the training path
        feeds host-precomputed seeds (FPS is parameter-independent), removing
        the sequential FPS loop from the train step entirely.
      qidx: optional precomputed ball-query indices (B, npoint, nsample) —
        like the FPS seeds they are parameter-independent, so the compact
        path's stage-1 pre-pass exports them and the full train step reuses
        them instead of re-sweeping 20k points per seed (round 4).

    Returns:
      new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]), fps indices
      (B, npoint), bn batch stats (train only), query indices (generic path
      only, else None).
    """
    if inds is None:
        inds = ops.furthest_point_sample(xyz, sa.npoint)
    new_xyz = ops.gather_points(xyz, inds)
    if (
        features is None
        and not train
        and sa.normalize_xyz
        and len(params["mlp"]) == 3
        and jax.default_backend() == "tpu"
    ):
        # xyz-only stage (sa1): fused query+group+normalize+MLP+pool kernel
        from graspnet_tpu.ops.pallas.crop import sa1_fused_pallas

        pooled = sa1_fused_pallas(
            xyz, new_xyz, params["mlp"], sa.radius, sa.nsample, eps
        )
        return new_xyz, pooled, inds, None, None
    if (
        features is not None
        and not train
        and sa.normalize_xyz
        and jax.default_backend() == "tpu"
    ):
        # feature-grouping stage (sa2-4): Pallas ball-query for the indices,
        # then XLA gather + BN-folded MLP.  Faster than the fully-fused
        # sa_feat_fused_pallas kernel, whose in-VMEM one-hot feature gather
        # costs an (nsample, N) x (N, C) matmul per seed — the XLA row
        # gather moves the same bytes without the dead FLOPs.
        from graspnet_tpu.ops.pallas.crop import fold_bn_eval
        from graspnet_tpu.ops.pallas.query import ball_query_pallas

        idx = ball_query_pallas(xyz, new_xyz, sa.radius, sa.nsample)
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        grouped_xyz = grouped_xyz / sa.radius
        grouped = jnp.concatenate(
            [grouped_xyz, ops.group_points(features, idx)], axis=-1
        )
        for w, bias in fold_bn_eval(params["mlp"], eps):
            grouped = jax.nn.relu(jnp.dot(grouped, w) + bias)
        return new_xyz, jnp.max(grouped, axis=2), inds, None, None
    idx = qidx if qidx is not None else ops.ball_query(xyz, new_xyz, sa.radius, sa.nsample)
    grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
    if sa.normalize_xyz:
        grouped_xyz = grouped_xyz / sa.radius
    if features is not None:
        grouped_feat = ops.group_points(features, idx)
        grouped = jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
    else:
        grouped = grouped_xyz
    out, stats = nn.shared_mlp(params["mlp"], grouped, train=train, eps=eps)
    pooled = jnp.max(out, axis=2)  # max over nsample
    return new_xyz, pooled, inds, stats, idx


def _fp_stage(
    params: Dict[str, Any],
    unknown_xyz: jax.Array,
    known_xyz: jax.Array,
    unknown_feat: jax.Array,
    known_feat: jax.Array,
    *,
    train: bool,
    eps: float,
):
    """Feature propagation: 3-NN inverse-distance interp + skip concat + MLP."""
    dist, idx = ops.three_nn(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    interp = ops.three_interpolate(known_feat, idx, weight)
    feat = jnp.concatenate([interp, unknown_feat], axis=-1)
    out, stats = nn.shared_mlp(params["mlp"], feat, train=train, eps=eps)
    return out, stats


def backbone_forward(
    params: Dict[str, Any],
    pointcloud: jax.Array,
    cfg: GraspNetConfig,
    *,
    train: bool = False,
    sa_inds: Dict[str, jax.Array] | None = None,
    sa_query_idx: Dict[str, jax.Array] | None = None,
) -> Tuple[jax.Array, jax.Array, Dict[str, Any]]:
    """Run the backbone.

    Args:
      pointcloud: (B, N, 3 + input_feature_dim).
      sa_inds: optional host-precomputed FPS chain {'sa1'..'sa4'}, each
        (B, npoint) indices into the previous stage's points.
      sa_query_idx: optional precomputed ball-query indices per stage
        (device arrays, e.g. exported by the compact path's stage-1
        pre-pass) — parameter-independent, so reusing them skips the
        per-seed membership sweeps in the train step.  In train mode the
        generic path exports the indices it computed as
        end_points['sa_query_idx'].

    Returns:
      seed_features (B, num_seed, 256), seed_xyz (B, num_seed, 3), and an
      end_points dict carrying intermediate tensors + (train) bn stats.
    """
    eps = cfg.bn_eps
    sa_inds = sa_inds or {}
    xyz = pointcloud[..., :3]
    if not sa_inds and jax.default_backend() == "tpu":
        # one kernel launch for the whole FPS cascade — selected coordinates
        # forward between stages in VMEM, so the intermediate gathers and the
        # three extra kernel launches disappear (see ops/pallas/fps.py)
        npoints = (cfg.sa1.npoint, cfg.sa2.npoint, cfg.sa3.npoint, cfg.sa4.npoint)
        if all(m % 128 == 0 for m in npoints[:-1]):
            from graspnet_tpu.ops.pallas.fps import fps_chain_pallas

            c1, c2, c3, c4 = fps_chain_pallas(xyz, npoints)
            sa_inds = {"sa1": c1, "sa2": c2, "sa3": c3, "sa4": c4}
    features = pointcloud[..., 3:] if pointcloud.shape[-1] > 3 else None
    end_points: Dict[str, Any] = {"input_xyz": xyz, "input_features": features}
    bn_stats: Dict[str, Any] = {}
    qidx_in = sa_query_idx or {}
    qidx_out: Dict[str, jax.Array] = {}

    sa1_xyz, sa1_feat, sa1_inds, st, qi = _sa_stage(
        params["sa1"], cfg.sa1, xyz, features, train=train, eps=eps,
        inds=sa_inds.get("sa1"), qidx=qidx_in.get("sa1"),
    )
    bn_stats["sa1"] = st
    if qi is not None:
        qidx_out["sa1"] = qi
    sa2_xyz, sa2_feat, sa2_inds, st, qi = _sa_stage(
        params["sa2"], cfg.sa2, sa1_xyz, sa1_feat, train=train, eps=eps,
        inds=sa_inds.get("sa2"), qidx=qidx_in.get("sa2"),
    )
    bn_stats["sa2"] = st
    if qi is not None:
        qidx_out["sa2"] = qi
    sa3_xyz, sa3_feat, sa3_inds, st, qi = _sa_stage(
        params["sa3"], cfg.sa3, sa2_xyz, sa2_feat, train=train, eps=eps,
        inds=sa_inds.get("sa3"), qidx=qidx_in.get("sa3"),
    )
    bn_stats["sa3"] = st
    if qi is not None:
        qidx_out["sa3"] = qi
    sa4_xyz, sa4_feat, sa4_inds, st, qi = _sa_stage(
        params["sa4"], cfg.sa4, sa3_xyz, sa3_feat, train=train, eps=eps,
        inds=sa_inds.get("sa4"), qidx=qidx_in.get("sa4"),
    )
    bn_stats["sa4"] = st
    if qi is not None:
        qidx_out["sa4"] = qi
    if train and qidx_out:
        end_points["sa_query_idx"] = qidx_out

    fp1_feat, st = _fp_stage(
        params["fp1"], sa3_xyz, sa4_xyz, sa3_feat, sa4_feat, train=train, eps=eps
    )
    bn_stats["fp1"] = st
    fp2_feat, st = _fp_stage(
        params["fp2"], sa2_xyz, sa3_xyz, sa2_feat, fp1_feat, train=train, eps=eps
    )
    bn_stats["fp2"] = st

    num_seed = sa2_xyz.shape[1]
    end_points.update(
        {
            "sa1_xyz": sa1_xyz,
            "sa1_inds": sa1_inds,
            "sa2_xyz": sa2_xyz,
            "fp2_features": fp2_feat,
            "fp2_xyz": sa2_xyz,
            # seed indices into the original cloud (reference backbone.py:127-129)
            "fp2_inds": sa1_inds[:, :num_seed],
        }
    )
    if train:
        end_points["bn_stats/backbone"] = bn_stats
    return fp2_feat, sa2_xyz, end_points
