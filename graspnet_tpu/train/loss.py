"""Training losses and metrics.

Re-implementation of reference models/loss.py with static shapes: every
boolean-indexed mean becomes a masked sum / count.  Total loss =
objectness CE + view MSE + 0.2 * grasp (loss.py:22-28); the grasp term is
score huber + angle CE + width huber(/0.1) + tolerance huber(/0.05), all
masked by objectness AND (label > THRESH_BAD), each normalized by
mask.sum() + 1e-6 (loss.py:69-132).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models.geometry import huber_loss


def _masked_mean(x: jax.Array, mask: jax.Array, eps: float = 1e-6) -> jax.Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / (jnp.sum(m) + eps)


def _cross_entropy(logits: jax.Array, target: jax.Array) -> jax.Array:
    """Per-element CE over the last axis of logits (torch CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]


def compute_objectness_loss(end_points: Dict[str, Any]) -> Tuple[jax.Array, Dict]:
    """CE over per-seed objectness (loss.py:30-45)."""
    score = end_points["objectness_score"]  # (B, Ns, 2)
    label_full = end_points["objectness_label"]  # (B, N)
    fp2_inds = end_points["fp2_inds"]
    label = jnp.take_along_axis(label_full, fp2_inds, axis=1)  # (B, Ns)
    loss = jnp.mean(_cross_entropy(score, label))
    pred = jnp.argmax(score, axis=-1)
    correct = (pred == label)
    metrics = {
        "stage1_objectness_acc": jnp.mean(correct.astype(jnp.float32)),
        "stage1_objectness_prec": _masked_mean(correct.astype(jnp.float32), pred == 1),
        "stage1_objectness_recall": _masked_mean(correct.astype(jnp.float32), label == 1),
    }
    return loss, metrics


def compute_view_loss(end_points: Dict[str, Any], cfg: GraspNetConfig):
    """Masked MSE over per-seed view scores (loss.py:47-66)."""
    view_score = end_points["view_score"]  # (B, Ns, V)
    view_label = end_points["batch_grasp_view_label"]
    label_full = end_points["objectness_label"]
    fp2_inds = end_points["fp2_inds"]
    obj = jnp.take_along_axis(label_full, fp2_inds, axis=1) > 0  # (B, Ns)
    obj_v = obj[..., None]  # mask repeated over V (loss.py:57)
    sq = jnp.square(view_score - view_label)
    # loss[mask].mean(): masked-element count = sum(obj) * V (loss.py:60-61)
    denom = jnp.sum(obj.astype(jnp.float32)) * view_score.shape[-1] + 1e-6
    loss = jnp.sum(sq * obj_v) / denom
    pos_pred = (view_score >= cfg.thresh_good) & obj_v
    metrics = {"stage1_pos_view_pred_count": jnp.sum(pos_pred.astype(jnp.int32))}
    return loss, metrics


def compute_grasp_loss(end_points: Dict[str, Any], cfg: GraspNetConfig):
    """Stage-2 losses at the matched view (loss.py:69-132)."""
    label_full = end_points["objectness_label"]
    fp2_inds = end_points["fp2_inds"]
    obj_mask = jnp.take_along_axis(label_full, fp2_inds, axis=1) > 0  # (B, Ns)

    grasp_label = end_points["batch_grasp_label"]  # (B, Ns, A, D)
    grasp_width = end_points["batch_grasp_width"]  # (B, Ns, A, D)
    grasp_tol = end_points["batch_grasp_tolerance"]

    # best angle per (seed, depth) from the label (loss.py:86-91)
    tgt_idx = jnp.argmax(grasp_label, axis=2, keepdims=True)  # (B, Ns, 1, D)
    tgt_label = jnp.take_along_axis(grasp_label, tgt_idx, axis=2)[:, :, 0]  # (B, Ns, D)
    tgt_width = jnp.take_along_axis(grasp_width, tgt_idx, axis=2)[:, :, 0]
    tgt_tol = jnp.take_along_axis(grasp_tol, tgt_idx, axis=2)[:, :, 0]

    graspable = tgt_label > cfg.thresh_bad
    loss_mask = (obj_mask[..., None] & graspable).astype(jnp.float32)  # (B, Ns, D)
    denom = jnp.sum(loss_mask) + 1e-6

    # 1. score huber (loss.py:97-102)
    score_pred = jnp.take_along_axis(end_points["grasp_score_pred"], tgt_idx, axis=2)[:, :, 0]
    score_loss = jnp.sum(huber_loss(score_pred - tgt_label, 1.0) * loss_mask) / denom

    # 2. in-plane angle CE (loss.py:104-116)
    tgt_cls = tgt_idx[:, :, 0]  # (B, Ns, D)
    angle_logits = jnp.swapaxes(end_points["grasp_angle_cls_pred"], 2, 3)  # (B, Ns, D, A)
    angle_loss = jnp.sum(_cross_entropy(angle_logits, tgt_cls) * loss_mask) / denom
    angle_pred = jnp.argmax(angle_logits, axis=-1)
    a = cfg.num_angle
    diff = jnp.abs(angle_pred - tgt_cls)
    acc0 = _masked_mean((angle_pred == tgt_cls).astype(jnp.float32), loss_mask > 0)
    acc15 = _masked_mean(((diff <= 1) | (diff >= a - 1)).astype(jnp.float32), loss_mask > 0)
    acc30 = _masked_mean(((diff <= 2) | (diff >= a - 2)).astype(jnp.float32), loss_mask > 0)

    # 3. width huber (loss.py:118-122)
    width_pred = jnp.take_along_axis(end_points["grasp_width_pred"], tgt_idx, axis=2)[:, :, 0]
    width_loss = (
        jnp.sum(huber_loss((width_pred - tgt_width) / cfg.grasp_max_width, 1.0) * loss_mask)
        / denom
    )

    # 4. tolerance huber (loss.py:124-128)
    tol_pred = jnp.take_along_axis(end_points["grasp_tolerance_pred"], tgt_idx, axis=2)[:, :, 0]
    tol_loss = (
        jnp.sum(huber_loss((tol_pred - tgt_tol) / cfg.grasp_max_tolerance, 1.0) * loss_mask)
        / denom
    )

    loss = score_loss + angle_loss + width_loss + tol_loss
    metrics = {
        "loss/stage2_grasp_score_loss": score_loss,
        "loss/stage2_grasp_angle_class_loss": angle_loss,
        "loss/stage2_grasp_width_loss": width_loss,
        "loss/stage2_grasp_tolerance_loss": tol_loss,
        "stage2_grasp_angle_class_acc/0_degree": acc0,
        "stage2_grasp_angle_class_acc/15_degree": acc15,
        "stage2_grasp_angle_class_acc/30_degree": acc30,
    }
    return loss, metrics


def get_loss(end_points: Dict[str, Any], cfg: GraspNetConfig):
    """Total loss = objectness + view + 0.2 * grasp (loss.py:22-28)."""
    obj_loss, m1 = compute_objectness_loss(end_points)
    view_loss, m2 = compute_view_loss(end_points, cfg)
    grasp_loss, m3 = compute_grasp_loss(end_points, cfg)
    loss = obj_loss + view_loss + 0.2 * grasp_loss
    metrics = {
        "loss/overall_loss": loss,
        "loss/stage1_objectness_loss": obj_loss,
        "loss/stage1_view_loss": view_loss,
        **m1,
        **m2,
        **m3,
    }
    return loss, metrics
