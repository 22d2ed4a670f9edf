"""Multi-scale grouping (MSG) set-abstraction / feature-propagation library.

TPU-native equivalents of the reference's generic PointNet++ module variants
(present in the reference but unused by the GraspNet model):

  * `PointnetSAModuleMSG` / `PointnetSAModule`
    (pointnet2/pointnet2_modules.py:78-162) -> `sa_msg_forward`
  * `PointnetSAModuleMSGVotes` (pointnet2_modules.py:274-353)
    -> `sa_msg_forward` with `inds=` (same extra indices-in/indices-out)
  * `PointnetLFPModuleMSG` (pointnet2_modules.py:418-497)
    -> `lfp_msg_forward`
  * `GroupAll` (pointnet2/pointnet2_utils.py:375-421) -> `npoint=None`

Functional, channels-last, and built on the same ops/nn layers as the
backbone, so every scale's grouped MLP is an MXU matmul stack.  Unlike the
reference modules (plain QueryAndGroup: center-subtract, NO /radius
normalization), these default to `normalize_xyz=False` to match.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from graspnet_tpu import ops
from graspnet_tpu.nn import layers as nn


def init_sa_msg(
    key: jax.Array,
    mlps: Sequence[Sequence[int]],
    *,
    in_dim: int,
    use_xyz: bool = True,
) -> Dict[str, Any]:
    """Parameters for one MSG stage: one SharedMLP per scale.

    `mlps[k]` are the hidden/output dims of scale k (the reference prepends
    the input channel count itself, +3 when use_xyz).
    """
    keys = jax.random.split(key, len(mlps))
    first = in_dim + (3 if use_xyz else 0)
    return {
        "mlps": [
            nn.shared_mlp_init(keys[i], (first, *mlps[i]))
            for i in range(len(mlps))
        ]
    }


def sa_msg_forward(
    params: Dict[str, Any],
    xyz: jax.Array,
    features: Optional[jax.Array],
    *,
    npoint: Optional[int],
    radii: Sequence[float],
    nsamples: Sequence[int],
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    inds: Optional[jax.Array] = None,
    train: bool = False,
    eps: float = 1e-5,
) -> Tuple[Optional[jax.Array], jax.Array, Optional[jax.Array], Any]:
    """Multi-scale set abstraction.

    Args:
      xyz: (B, N, 3); features: (B, N, C) or None.
      npoint: FPS target; None = GroupAll (one group over all N points).
      inds: optional precomputed sample indices (B, npoint) — the
        PointnetSAModuleMSGVotes contract (pointnet2_modules.py:330-334).

    Returns:
      new_xyz (B, npoint, 3) | None, new_features (B, npoint, sum_k C_k),
      inds, bn stats (train only).
    """
    stats_all: List[Any] = []
    if npoint is None:
        # GroupAll: a single group containing every point
        grouped = xyz[:, None, :, :]  # (B, 1, N, 3)
        if features is not None:
            feats = features[:, None, :, :]
            grouped = jnp.concatenate([grouped, feats], axis=-1) if use_xyz else feats
        outs = []
        for layers in params["mlps"]:
            out, st = nn.shared_mlp(layers, grouped, train=train, eps=eps)
            outs.append(jnp.max(out, axis=2))  # (B, 1, C_k)
            stats_all.append(st)
        return (
            None,
            jnp.concatenate(outs, axis=-1),
            None,
            stats_all if train else None,
        )

    if inds is None:
        inds = ops.furthest_point_sample(xyz, npoint)
    new_xyz = ops.gather_points(xyz, inds)

    outs = []
    for layers, radius, nsample in zip(params["mlps"], radii, nsamples):
        idx = ops.ball_query(xyz, new_xyz, radius, nsample)
        grouped_xyz = ops.group_points(xyz, idx) - new_xyz[:, :, None, :]
        if normalize_xyz:
            grouped_xyz = grouped_xyz / radius
        if features is not None:
            grouped_feat = ops.group_points(features, idx)
            grouped = (
                jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
                if use_xyz
                else grouped_feat
            )
        else:
            grouped = grouped_xyz
        out, st = nn.shared_mlp(layers, grouped, train=train, eps=eps)
        outs.append(jnp.max(out, axis=2))  # max over nsample
        stats_all.append(st)
    return (
        new_xyz,
        jnp.concatenate(outs, axis=-1),
        inds,
        stats_all if train else None,
    )


def init_lfp_msg(
    key: jax.Array,
    mlps: Sequence[Sequence[int]],
    post_mlp: Sequence[int],
    *,
    in_dim: int,
    skip_dim: int,
    use_xyz: bool = True,
) -> Dict[str, Any]:
    """Parameters for a learnable-feature-propagation stage.

    `post_mlp` dims are applied after the skip concat; its input dim is
    mlps[k][-1] + skip_dim (the reference wires this explicitly through the
    post_mlp spec, pointnet2_modules.py:438).
    """
    keys = jax.random.split(key, len(mlps) + 1)
    first = in_dim + (3 if use_xyz else 0)
    return {
        "mlps": [
            nn.shared_mlp_init(keys[i], (first, *mlps[i]))
            for i in range(len(mlps))
        ],
        "post": nn.shared_mlp_init(
            keys[-1], (mlps[0][-1] + skip_dim, *post_mlp)
        ),
    }


def lfp_msg_forward(
    params: Dict[str, Any],
    xyz2: jax.Array,
    xyz1: jax.Array,
    features2: Optional[jax.Array],
    features1: Optional[jax.Array],
    *,
    radii: Sequence[float],
    nsamples: Sequence[int],
    use_xyz: bool = True,
    train: bool = False,
    eps: float = 1e-5,
) -> Tuple[jax.Array, Any]:
    """Learnable feature propagation (PointnetLFPModuleMSG.forward,
    pointnet2_modules.py:454-497): group xyz1-points (+features1) around the
    xyz2 centers per scale, MLP+pool, concat the xyz2 skip features, post-MLP.

    Returns ((B, N2, sum_k post_C_k), bn stats).
    """
    outs = []
    stats_all: List[Any] = []
    for layers, radius, nsample in zip(params["mlps"], radii, nsamples):
        idx = ops.ball_query(xyz1, xyz2, radius, nsample)
        grouped_xyz = ops.group_points(xyz1, idx) - xyz2[:, :, None, :]
        if features1 is not None:
            grouped_feat = ops.group_points(features1, idx)
            grouped = (
                jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)
                if use_xyz
                else grouped_feat
            )
        else:
            grouped = grouped_xyz
        out, st = nn.shared_mlp(layers, grouped, train=train, eps=eps)
        stats_all.append(st)
        pooled = jnp.max(out, axis=2)  # (B, N2, C_k)
        if features2 is not None:
            pooled = jnp.concatenate([pooled, features2], axis=-1)
        post, st2 = nn.shared_mlp(params["post"], pooled, train=train, eps=eps)
        stats_all.append(st2)
        outs.append(post)
    return jnp.concatenate(outs, axis=-1), (stats_all if train else None)
