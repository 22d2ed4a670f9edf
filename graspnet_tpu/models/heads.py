"""Model heads: ApproachNet, CloudCrop, OperationNet, ToleranceNet.

TPU-first redesign of reference models/modules.py.  Key deviation from the
reference: CloudCrop's four per-depth cylinder croppings (a Python loop over
groupers at modules.py:127-131) are fused — the rotated offsets are computed
once and the four hmax masks share them, then one SharedMLP + max-pool runs
over the whole (seed × depth) candidate block.

Tensor conventions (channels-last):
  objectness_score: (B, Ns, 2)
  view_score:       (B, Ns, V)
  grasp_*_pred:     (B, Ns, A, D)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from graspnet_tpu import ops
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.nn import layers as nn
from graspnet_tpu.models import geometry
from graspnet_tpu.ops.query import _select_first_hits


# ------------------------------------------------------------ ApproachNet --


def init_approach(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    c = cfg.seed_feature_dim
    v2 = 2 + cfg.num_view
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nn.dense_init(k1, c, c),
        "bn1": nn.batch_norm_init(c),
        "conv2": nn.dense_init(k2, c, v2),
        "bn2": nn.batch_norm_init(v2),
        "conv3": nn.dense_init(k3, v2, v2),
    }


def approach_forward(
    params: Dict[str, Any],
    seed_xyz: jax.Array,
    seed_features: jax.Array,
    cfg: GraspNetConfig,
    *,
    train: bool = False,
) -> Dict[str, Any]:
    """Objectness + approach-view scoring per seed (reference modules.py:41-77).

    Returns end_points fragment with objectness_score, view_score, and the
    selected top view (inds / score / xyz / rot with zero in-plane angle).
    """
    eps = cfg.bn_eps
    x = nn.dense(params["conv1"], seed_features)
    x, st1 = nn.batch_norm(params["bn1"], x, train=train, eps=eps)
    x = jax.nn.relu(x)
    x = nn.dense(params["conv2"], x)
    x, st2 = nn.batch_norm(params["bn2"], x, train=train, eps=eps)
    x = jax.nn.relu(x)
    x = nn.dense(params["conv3"], x)

    objectness_score = x[..., :2]
    view_score = x[..., 2 : 2 + cfg.num_view]  # (B, Ns, V)

    top_view_inds = jnp.argmax(view_score, axis=-1)  # (B, Ns); first-max ties
    top_view_scores = jnp.max(view_score, axis=-1)
    template_views = geometry.generate_grasp_views(cfg.num_view)  # (V, 3)
    vp_xyz = template_views[top_view_inds]  # (B, Ns, 3)
    angle = jnp.zeros_like(vp_xyz[..., 0])
    vp_rot = geometry.batch_viewpoint_params_to_matrix(-vp_xyz, angle)

    out = {
        "objectness_score": objectness_score,
        "view_score": view_score,
        "grasp_top_view_inds": top_view_inds,
        "grasp_top_view_score": top_view_scores,
        "grasp_top_view_xyz": vp_xyz,
        "grasp_top_view_rot": vp_rot,
    }
    if train:
        out["bn_stats/approach"] = {"bn1": st1, "bn2": st2}
    return out


# -------------------------------------------------------------- CloudCrop --


def cylinder_query_multi_depth(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array,
    radius: float,
    hmin: float,
    hmax_list: Tuple[float, ...],
    nsample: int,
    chunk: int = 128,
) -> jax.Array:
    """Cylinder query for several hmax values sharing one rotation pass.

    Equivalent to running ops.cylinder_query once per depth (the reference's
    grouper loop, modules.py:127-131) but computes the rotated offsets once.

    Returns (B, M, D, nsample) int32 indices.
    """
    if jax.default_backend() == "tpu":
        from graspnet_tpu.ops.pallas.query import cylinder_query_multi_pallas

        return cylinder_query_multi_pallas(
            xyz, new_xyz, rot, radius, hmin, tuple(hmax_list), nsample
        )
    r2 = radius * radius
    ndepth = len(hmax_list)
    hmaxs = jnp.asarray(hmax_list, dtype=xyz.dtype)

    def per_scene(points, centers, rots):
        def per_chunk(args):
            c, R = args
            diff = points[None, :, :] - c[:, None, :]
            x_r = (
                diff[..., 0] * R[:, None, 0, 0]
                + diff[..., 1] * R[:, None, 1, 0]
                + diff[..., 2] * R[:, None, 2, 0]
            )
            y_r = (
                diff[..., 0] * R[:, None, 0, 1]
                + diff[..., 1] * R[:, None, 1, 1]
                + diff[..., 2] * R[:, None, 2, 1]
            )
            z_r = (
                diff[..., 0] * R[:, None, 0, 2]
                + diff[..., 1] * R[:, None, 1, 2]
                + diff[..., 2] * R[:, None, 2, 2]
            )
            base = (y_r * y_r + z_r * z_r < r2) & (x_r > hmin)
            # (chunk, D, N) mask per depth
            mask = base[:, None, :] & (x_r[:, None, :] < hmaxs[None, :, None])
            return _select_first_hits(mask, nsample)  # (chunk, D, nsample)

        m = centers.shape[0]
        if m <= chunk:
            return per_chunk((centers, rots))
        assert m % chunk == 0, f"seed count {m} not divisible by chunk {chunk}"
        cs = centers.reshape(m // chunk, chunk, 3)
        rs = rots.reshape(m // chunk, chunk, 3, 3)
        out = lax.map(per_chunk, (cs, rs))
        return out.reshape(m, ndepth, nsample)

    return jax.vmap(per_scene)(xyz, new_xyz, rot)


def init_crop(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    return {"mlp": nn.shared_mlp_init(key, cfg.crop_mlp)}


def crop_forward(
    params: Dict[str, Any],
    seed_xyz: jax.Array,
    pointcloud: jax.Array,
    vp_rot: jax.Array,
    cfg: GraspNetConfig,
    *,
    train: bool = False,
):
    """Cylinder-crop candidate regions at all depths and embed them.

    Args:
      seed_xyz: (B, Ns, 3) crop centers.
      pointcloud: (B, N, 3) the full input cloud (reference crops against
        input_xyz, graspnet.py:49).
      vp_rot: (B, Ns, 3, 3) approach rotations.

    Returns:
      vp_features (B, Ns, D, C), bn stats (train only).
    """
    if (
        not train
        and len(params["mlp"]) == 3
        and jax.default_backend() == "tpu"
    ):
        # fused query+gather+rotate+MLP+pool kernel (eval only: BN folded)
        from graspnet_tpu.ops.pallas.crop import crop_fused_pallas, fold_bn_eval

        (w1, b1), (w2, b2), (w3, b3) = fold_bn_eval(params["mlp"], cfg.bn_eps)
        pooled = crop_fused_pallas(
            pointcloud,
            seed_xyz,
            vp_rot,
            (w1, b1, w2, b2, w3, b3),
            cfg.cylinder_radius,
            cfg.hmin,
            tuple(cfg.hmax_list),
            cfg.crop_nsample,
        )
        return pooled, None
    if jax.default_backend() == "tpu":
        # fused query+gather+rotate (train path / generic-MLP eval): one
        # kernel, no HBM index tensor.  Non-differentiable w.r.t. cloud /
        # seeds / rotations — in training those are input data and label
        # grasp points/views, which carry no gradient in the reference
        # either (grouping indices are discrete).
        from graspnet_tpu.ops.pallas.crop import crop_group_pallas

        grouped = crop_group_pallas(
            pointcloud,
            seed_xyz,
            vp_rot,
            cfg.cylinder_radius,
            cfg.hmin,
            tuple(cfg.hmax_list),
            cfg.crop_nsample,
        )  # (B, Ns, D, S, 3) already in the gripper frame
    else:
        idx = cylinder_query_multi_depth(
            pointcloud,
            seed_xyz,
            vp_rot,
            cfg.cylinder_radius,
            cfg.hmin,
            cfg.hmax_list,
            cfg.crop_nsample,
        )  # (B, Ns, D, S)
        b, ns, nd, s = idx.shape
        grouped = ops.group_points(pointcloud, idx.reshape(b, ns * nd, s))
        grouped = grouped.reshape(b, ns, nd, s, 3) - seed_xyz[:, :, None, None, :]
        # rotate offsets into the gripper frame: offset @ R (modules.py:527-530)
        grouped = jnp.einsum("bndsi,bnij->bndsj", grouped, vp_rot)
    if (
        train
        and len(params["mlp"]) == 3
        and all("bn" in l for l in params["mlp"])
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
    ):
        # fused batch-stats MLP + pool: activations never touch HBM
        # (ops/pallas/mlp_train.py).  XLA path kept for CPU AND for any
        # multi-device runtime: the kernel's batch statistics are per-call
        # (unshardable pallas_call), while the data-parallel trainer
        # documents exact global-batch sync-BN — on a mesh, GSPMD's
        # jnp.mean collectives deliver that, so the gate requires a
        # single-device runtime (ADVICE r3 #1)
        from graspnet_tpu.ops.pallas.mlp_train import crop_mlp_train_pallas

        # GRASPNET_TRAIN_PRECISION=highest forces exact-f32 matmuls in the
        # fused train kernel (~3x matmul cost) — the A/B knob behind the
        # precision-class convergence artifact (perf/precision_ab_r5.json)
        import os as _os

        return crop_mlp_train_pallas(
            params["mlp"], grouped, cfg.bn_eps,
            precision=_os.environ.get("GRASPNET_TRAIN_PRECISION", "default"),
        )
    out, stats = nn.shared_mlp(params["mlp"], grouped, train=train, eps=cfg.bn_eps)
    pooled = jnp.max(out, axis=3)  # max over nsample -> (B, Ns, D, C)
    return pooled, stats


# ------------------------------------------------- OperationNet/Tolerance --


def init_operation(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    c = cfg.crop_mlp[-1]
    h = cfg.head_hidden
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nn.dense_init(k1, c, h),
        "bn1": nn.batch_norm_init(h),
        "conv2": nn.dense_init(k2, h, h),
        "bn2": nn.batch_norm_init(h),
        "conv3": nn.dense_init(k3, h, 3 * cfg.num_angle),
    }


def init_tolerance(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    c = cfg.crop_mlp[-1]
    h = cfg.head_hidden
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1": nn.dense_init(k1, c, h),
        "bn1": nn.batch_norm_init(h),
        "conv2": nn.dense_init(k2, h, h),
        "bn2": nn.batch_norm_init(h),
        "conv3": nn.dense_init(k3, h, cfg.num_angle),
    }


def _head_trunk(params, x, *, train: bool, eps: float):
    x = nn.dense(params["conv1"], x)
    x, st1 = nn.batch_norm(params["bn1"], x, train=train, eps=eps)
    x = jax.nn.relu(x)
    x = nn.dense(params["conv2"], x)
    x, st2 = nn.batch_norm(params["bn2"], x, train=train, eps=eps)
    x = jax.nn.relu(x)
    x = nn.dense(params["conv3"], x)
    return x, {"bn1": st1, "bn2": st2}


def operation_forward(params, vp_features, cfg: GraspNetConfig, *, train=False):
    """Score / in-plane-angle class / width per (seed, angle, depth).

    vp_features: (B, Ns, D, C) -> three (B, Ns, A, D) tensors
    (reference modules.py:169-191 splits channels [score | angle | width]).
    """
    x, stats = _head_trunk(params, vp_features, train=train, eps=cfg.bn_eps)
    a = cfg.num_angle
    x = jnp.swapaxes(x, 2, 3)  # (B, Ns, 3A, D)
    out = {
        "grasp_score_pred": x[:, :, 0:a],
        "grasp_angle_cls_pred": x[:, :, a : 2 * a],
        "grasp_width_pred": x[:, :, 2 * a : 3 * a],
    }
    if train:
        out["bn_stats/operation"] = stats
    return out


def tolerance_forward(params, vp_features, cfg: GraspNetConfig, *, train=False):
    """Grasp tolerance per (seed, angle, depth) (reference modules.py:214-232)."""
    x, stats = _head_trunk(params, vp_features, train=train, eps=cfg.bn_eps)
    out = {"grasp_tolerance_pred": jnp.swapaxes(x, 2, 3)}  # (B, Ns, A, D)
    if train:
        out["bn_stats/tolerance"] = stats
    return out
