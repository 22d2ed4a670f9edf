"""GraspNet end-to-end model: Stage 1 (views) -> Stage 2 (grasp params) -> decode.

Reference: models/graspnet.py.  The forward is a pure function over a params
pytree; training mode additionally consumes pre-padded grasp labels (see
graspnet_tpu.train.label_pipeline) and crops at label grasp points with
matched-label rotations (reference graspnet.py:48-56), while inference crops
at the seed points with predicted rotations.

`pred_decode` is fully vectorized & jit-able: it returns a dense (B, Ns, 17)
grasp array plus an objectness validity mask instead of boolean-indexed ragged
lists (reference graspnet.py:77-134) — masks, not dynamic shapes, per XLA.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import geometry, heads
from graspnet_tpu.models.backbone import backbone_forward, init_backbone


def init_graspnet(key: jax.Array, cfg: GraspNetConfig) -> Dict[str, Any]:
    ks = jax.random.split(key, 5)
    return {
        "backbone": init_backbone(ks[0], cfg),
        "approach": heads.init_approach(ks[1], cfg),
        "crop": heads.init_crop(ks[2], cfg),
        "operation": heads.init_operation(ks[3], cfg),
        "tolerance": heads.init_tolerance(ks[4], cfg),
    }


def graspnet_forward(
    params: Dict[str, Any],
    point_clouds: jax.Array,
    cfg: GraspNetConfig,
    *,
    train: bool = False,
    labels: Optional[Dict[str, jax.Array]] = None,
    seed_sharding=None,
) -> Dict[str, Any]:
    """Full forward pass.

    Args:
      point_clouds: (B, N, 3 + input_feature_dim).
      labels: padded grasp-label dict (training only), as produced by
        graspnet_tpu.train.label_pipeline.build_scene_labels; may also carry
        'sa_inds' with the host-precomputed FPS chain.
      seed_sharding: optional NamedSharding for (B, Ns, ...) seed tensors
        (e.g. P('data', 'candidate') on a 2-D mesh).  When set, the stage-2
        inputs (crop seeds/rotations, matched label slabs) are pinned to it
        so GSPMD partitions the crop/head compute — the train-step analogue
        of parallel.candidate's sharded inference: the dominant crop
        fwd+bwd splits over the candidate axis while batch-stats BN means
        and weight-gradient reductions become exact cross-shard collectives
        automatically (sync-BN preserved).

    Returns:
      end_points dict (see SURVEY.md §3.5 for the reference key contract).
    """

    def pin(x):
        return (
            jax.lax.with_sharding_constraint(x, seed_sharding)
            if seed_sharding is not None
            else x
        )
    sa_inds = labels.get("sa_inds") if labels else None
    sa_qidx = labels.get("sa_query_idx") if labels else None
    with jax.named_scope("backbone"):
        seed_features, seed_xyz, end_points = backbone_forward(
            params["backbone"], point_clouds, cfg, train=train,
            sa_inds=sa_inds, sa_query_idx=sa_qidx,
        )
    end_points["point_clouds"] = point_clouds
    with jax.named_scope("approach"):
        end_points.update(
            heads.approach_forward(
                params["approach"], seed_xyz, seed_features, cfg, train=train
            )
        )

    input_xyz = end_points["input_xyz"]
    # Crop source follows label availability, not BN mode: the reference's
    # is_training is a constructor flag, so its eval epoch (net.eval()) still
    # crops at label points with matched rotations while BN uses running
    # stats (reference graspnet.py:50-56, train.py:162).
    has_labels = labels is not None and (
        "matched_label_raw" in labels or "grasp_labels" in labels
    )
    if train or has_labels:
        from graspnet_tpu.train import label_pipeline

        assert has_labels, "training forward requires padded labels"
        if "matched_label_raw" in labels:
            # compact two-phase path: matched slabs were sliced on the host
            # at the pre-pass top view (label_pipeline.finalize_scene_labels);
            # the log rescale happens here so values are bit-identical to the
            # full path
            end_points.update(label_pipeline.process_matched_labels(labels, cfg))
        else:
            end_points.update(
                label_pipeline.process_grasp_labels(end_points, labels, cfg)
            )
            matched = label_pipeline.match_grasp_view_and_label(end_points, cfg)
            end_points.update(matched)
        crop_rot = end_points["batch_grasp_view_rot"]
        crop_seed = end_points["batch_grasp_point"]
        if seed_sharding is not None:
            # matched label slabs feed the per-seed loss terms: pin them so
            # the loss compute shards with the crop outputs
            for k in (
                "batch_grasp_label",
                "batch_grasp_width",
                "batch_grasp_tolerance",
                "batch_grasp_view_label",
            ):
                if k in end_points:
                    end_points[k] = pin(end_points[k])
    else:
        crop_rot = end_points["grasp_top_view_rot"]
        crop_seed = end_points["fp2_xyz"]
    crop_rot = pin(crop_rot)
    crop_seed = pin(crop_seed)

    with jax.named_scope("crop"):
        vp_features, crop_stats = heads.crop_forward(
            params["crop"], crop_seed, input_xyz, crop_rot, cfg, train=train
        )
    if train:
        end_points["bn_stats/crop"] = crop_stats
    with jax.named_scope("operation_tolerance"):
        end_points.update(
            heads.operation_forward(params["operation"], vp_features, cfg, train=train)
        )
        end_points.update(
            heads.tolerance_forward(params["tolerance"], vp_features, cfg, train=train)
        )
    return end_points


def pred_decode(
    end_points: Dict[str, Any], cfg: GraspNetConfig
) -> Tuple[jax.Array, jax.Array]:
    """Decode dense predictions into 17-float grasp rows + validity mask.

    Row layout (the GraspGroup array contract, reference graspnet.py:131-133):
    [score, width, height, depth, 9 x rot (row-major), 3 x center, obj_id].

    Returns:
      grasps: (B, Ns, 17) float32.
      valid: (B, Ns) bool — the objectness mask (argmax class == 1).
    """
    score = end_points["grasp_score_pred"]  # (B, Ns, A, D)
    angle_cls = end_points["grasp_angle_cls_pred"]
    width = end_points["grasp_width_pred"]
    tolerance = end_points["grasp_tolerance_pred"]
    center = end_points["fp2_xyz"]  # (B, Ns, 3)
    approaching = -end_points["grasp_top_view_xyz"]
    objectness = end_points["objectness_score"]  # (B, Ns, 2)

    # width post-processing before selection (reference graspnet.py:87-88)
    width = jnp.clip(cfg.width_scale * width, 0.0, cfg.grasp_max_width)

    # select in-plane angle per (seed, depth): argmax over A (graspnet.py:93-99)
    a_idx = jnp.argmax(angle_cls, axis=2, keepdims=True)  # (B, Ns, 1, D)
    grasp_angle = a_idx[:, :, 0, :].astype(jnp.float32) / cfg.num_angle * jnp.pi
    score = jnp.take_along_axis(score, a_idx, axis=2)[:, :, 0, :]  # (B, Ns, D)
    width = jnp.take_along_axis(width, a_idx, axis=2)[:, :, 0, :]
    tolerance = jnp.take_along_axis(tolerance, a_idx, axis=2)[:, :, 0, :]

    # select depth: argmax of score over D (graspnet.py:103-109)
    d_idx = jnp.argmax(score, axis=-1, keepdims=True)  # (B, Ns, 1)
    grasp_depth = (d_idx[..., 0].astype(jnp.float32) + 1.0) * cfg.depth_unit
    score = jnp.take_along_axis(score, d_idx, axis=-1)[..., 0]  # (B, Ns)
    grasp_angle = jnp.take_along_axis(grasp_angle, d_idx, axis=-1)[..., 0]
    width = jnp.take_along_axis(width, d_idx, axis=-1)[..., 0]
    tolerance = jnp.take_along_axis(tolerance, d_idx, axis=-1)[..., 0]

    # objectness mask + tolerance rescale (graspnet.py:112-121)
    valid = jnp.argmax(objectness, axis=-1) == 1
    score = score * tolerance / cfg.grasp_max_tolerance

    rot = geometry.batch_viewpoint_params_to_matrix(approaching, grasp_angle)
    b, ns = score.shape
    rot9 = rot.reshape(b, ns, 9)
    height = jnp.full_like(score, cfg.grasp_height)
    obj_ids = jnp.full_like(score, -1.0)
    grasps = jnp.concatenate(
        [
            score[..., None],
            width[..., None],
            height[..., None],
            grasp_depth[..., None],
            rot9,
            center,
            obj_ids[..., None],
        ],
        axis=-1,
    )
    return grasps, valid
