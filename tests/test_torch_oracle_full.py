"""FULL-model torch oracle: stage 2 + decode + loss vs literal transcriptions.

test_torch_oracle.py pins the backbone composition; this file closes the rest
of the cross-framework gap (VERDICT round-1 item #1): a literal torch
transcription of the reference's ApproachNet (modules.py:22-77), CloudCrop
with its four CylinderQueryAndGroup groupers (modules.py:80-141,
pointnet2_utils.py:461-554), OperationNet / ToleranceNet (modules.py:144-232),
pred_decode (graspnet.py:77-134), and get_loss (loss.py:22-132) is evaluated
on the SAME converted synthetic checkpoint and the SAME sampling/grouping
indices as graspnet_forward, end to end:

  * eval mode  — crop at predicted seeds/rotations, BN eval, decode to
    (Ns, 17) rows + objectness mask;
  * train mode — crop at label grasp points with matched-label rotations
    (reference eval-epoch semantics with BN eval AND true train mode with
    batch-stat BN), then get_loss on the matched label slabs.

Sampling / query indices are non-differentiable select ops pinned elsewhere
(tests/test_ops.py, test_pallas_query.py); sharing them between frameworks
isolates this test to the numeric path, where a transposed kernel, a swapped
gather axis, a misrouted channel split, or a wrong mask denominator anywhere
in stage 2 fails the comparison.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from graspnet_tpu import checkpoint, ops
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import heads
from graspnet_tpu.models.graspnet import graspnet_forward, pred_decode
from graspnet_tpu.train import label_pipeline as lp
from graspnet_tpu.train.loss import get_loss

from tests.test_checkpoint import make_reference_state_dict
from tests.test_torch_oracle import _gather, _torch_mlp2d, torch_backbone
from tests.test_labels import make_scene, reference_label_oracle

torch = pytest.importorskip("torch")
import torch.nn.functional as tf  # noqa: E402


# ------------------------------------------------------------------------
# torch transcriptions of reference utils/loss_utils.py
# ------------------------------------------------------------------------


def t_generate_grasp_views(n):
    """loss_utils.py:41-66 — Fibonacci lattice, float64 math cast to f32."""
    phi = (np.sqrt(5) - 1) / 2
    views = []
    for i in range(n):
        zi = (2 * i + 1) / n - 1
        xi = np.sqrt(1 - zi**2) * np.cos(2 * i * np.pi * phi)
        yi = np.sqrt(1 - zi**2) * np.sin(2 * i * np.pi * phi)
        views.append([xi, yi, zi])
    return torch.from_numpy(np.array(views).astype(np.float32))


def t_view_matrix(towards, angle):
    """loss_utils.py:68-96 — approach + in-plane angle -> rotation matrix."""
    axis_x = towards
    ones = torch.ones(axis_x.shape[0], dtype=axis_x.dtype)
    zeros = torch.zeros(axis_x.shape[0], dtype=axis_x.dtype)
    axis_y = torch.stack([-axis_x[:, 1], axis_x[:, 0], zeros], dim=-1)
    mask_y = torch.norm(axis_y, dim=-1) == 0
    axis_y[mask_y, 1] = 1
    axis_x = axis_x / torch.norm(axis_x, dim=-1, keepdim=True)
    axis_y = axis_y / torch.norm(axis_y, dim=-1, keepdim=True)
    axis_z = torch.cross(axis_x, axis_y, dim=-1)
    sin, cos = torch.sin(angle), torch.cos(angle)
    r1 = torch.stack([ones, zeros, zeros, zeros, cos, -sin, zeros, sin, cos], dim=-1)
    r1 = r1.reshape([-1, 3, 3])
    r2 = torch.stack([axis_x, axis_y, axis_z], dim=-1)
    return torch.matmul(r2, r1)


def t_huber(error, delta=1.0):
    """loss_utils.py:98-115."""
    abs_error = torch.abs(error)
    quadratic = torch.clamp(abs_error, max=delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


# ------------------------------------------------------------------------
# torch transcriptions of reference models/modules.py
# ------------------------------------------------------------------------


def _t_bn(x, sd, prefix, training):
    return tf.batch_norm(
        x,
        sd[f"{prefix}.running_mean"].clone(),
        sd[f"{prefix}.running_var"].clone(),
        sd[f"{prefix}.weight"],
        sd[f"{prefix}.bias"],
        training=training,
        eps=1e-5,
    )


def _t_conv_trunk(sd, prefix, x, training):
    """conv1/bn1/relu -> conv2/bn2/relu -> conv3 over (B, C, L) tensors
    (the shared trunk shape of ApproachNet / OperationNet / ToleranceNet)."""
    x = tf.conv1d(x, sd[f"{prefix}.conv1.weight"], sd[f"{prefix}.conv1.bias"])
    x = tf.relu(_t_bn(x, sd, f"{prefix}.bn1", training))
    x = tf.conv1d(x, sd[f"{prefix}.conv2.weight"], sd[f"{prefix}.conv2.bias"])
    x = tf.relu(_t_bn(x, sd, f"{prefix}.bn2", training))
    return tf.conv1d(x, sd[f"{prefix}.conv3.weight"], sd[f"{prefix}.conv3.bias"])


def t_approach(sd, seed_features, num_view, training):
    """modules.py:41-77.  seed_features: (B, C, Ns) torch."""
    x = _t_conv_trunk(sd, "view_estimator.vpmodule", seed_features, training)
    objectness_score = x[:, :2, :]  # (B, 2, Ns)
    view_score = x[:, 2 : 2 + num_view, :].transpose(1, 2).contiguous()
    top_view_scores, top_view_inds = torch.max(view_score, dim=2)
    template_views = t_generate_grasp_views(num_view)
    vp_xyz = template_views[top_view_inds]  # (B, Ns, 3)
    b, ns = top_view_inds.shape
    vp_rot = t_view_matrix(
        -vp_xyz.reshape(-1, 3), torch.zeros(b * ns, dtype=vp_xyz.dtype)
    ).view(b, ns, 3, 3)
    return {
        "objectness_score": objectness_score,
        "view_score": view_score,
        "grasp_top_view_inds": top_view_inds,
        "grasp_top_view_score": top_view_scores,
        "grasp_top_view_xyz": vp_xyz,
        "grasp_top_view_rot": vp_rot,
    }


def t_crop(sd, cloud, new_xyz, rot, idx, training):
    """modules.py:109-141 + CylinderQueryAndGroup (pointnet2_utils.py:522-530)
    on shared query indices idx (B, Ns, D, S).  Returns (B, C, Ns, D)."""
    b, ns, nd, s = idx.shape
    grouped = _gather(cloud, idx.reshape(b, -1)).reshape(b, ns, nd, s, 3)
    grouped = grouped - new_xyz[:, :, None, None, :]  # center-subtract (:524)
    # rotate offsets into the gripper frame: row-vector @ rot (:528-529)
    grouped = np.einsum("bndsi,bnij->bndsj", grouped, rot)
    # stack depths at dim 3 then view (B, C, Ns*D, S) (modules.py:131-132)
    t = torch.from_numpy(
        np.ascontiguousarray(np.transpose(grouped, (0, 4, 1, 2, 3)))
    ).reshape(b, 3, ns * nd, s)
    t = _torch_mlp2d(sd, "grasp_generator.crop.mlps", t, 3, training=training)
    t = tf.max_pool2d(t, kernel_size=[1, t.size(3)])  # (:137-139)
    return t.view(b, -1, ns, nd)


def t_operation(sd, vp_features, num_angle, training):
    """modules.py:169-191.  vp_features: (B, C, Ns, D) torch."""
    b, _, ns, nd = vp_features.size()
    x = _t_conv_trunk(
        sd, "grasp_generator.operation", vp_features.reshape(b, -1, ns * nd), training
    ).view(b, -1, ns, nd)
    return {
        "grasp_score_pred": x[:, 0:num_angle],
        "grasp_angle_cls_pred": x[:, num_angle : 2 * num_angle],
        "grasp_width_pred": x[:, 2 * num_angle : 3 * num_angle],
    }


def t_tolerance(sd, vp_features, training):
    """modules.py:214-232."""
    b, _, ns, nd = vp_features.size()
    x = _t_conv_trunk(
        sd, "grasp_generator.tolerance", vp_features.reshape(b, -1, ns * nd), training
    ).view(b, -1, ns, nd)
    return {"grasp_tolerance_pred": x}


# ------------------------------------------------------------------------
# torch transcription of reference pred_decode (graspnet.py:77-134),
# dense variant: rows for ALL seeds + the objectness mask (the reference
# boolean-indexes; row values are identical either way)
# ------------------------------------------------------------------------


def t_pred_decode(tp, cfg):
    rows, masks = [], []
    b = tp["objectness_score"].size(0)
    for i in range(b):
        objectness_score = tp["objectness_score"][i].float()
        grasp_score = tp["grasp_score_pred"][i].float()  # (A, Ns, D)
        grasp_center = tp["fp2_xyz"][i].float()
        approaching = -tp["grasp_top_view_xyz"][i].float()
        grasp_angle_class_score = tp["grasp_angle_cls_pred"][i]
        grasp_width = 1.2 * tp["grasp_width_pred"][i]
        grasp_width = torch.clamp(grasp_width, min=0, max=cfg.grasp_max_width)
        grasp_tolerance = tp["grasp_tolerance_pred"][i]

        grasp_angle_class = torch.argmax(grasp_angle_class_score, 0)  # (Ns, D)
        grasp_angle = grasp_angle_class.float() / cfg.num_angle * np.pi
        gac = grasp_angle_class.unsqueeze(0)
        grasp_score = torch.gather(grasp_score, 0, gac).squeeze(0)  # (Ns, D)
        grasp_width = torch.gather(grasp_width, 0, gac).squeeze(0)
        grasp_tolerance = torch.gather(grasp_tolerance, 0, gac).squeeze(0)

        grasp_depth_class = torch.argmax(grasp_score, 1, keepdims=True)  # (Ns, 1)
        grasp_depth = (grasp_depth_class.float() + 1) * cfg.depth_unit
        grasp_score = torch.gather(grasp_score, 1, grasp_depth_class)
        grasp_angle = torch.gather(grasp_angle, 1, grasp_depth_class)
        grasp_width = torch.gather(grasp_width, 1, grasp_depth_class)
        grasp_tolerance = torch.gather(grasp_tolerance, 1, grasp_depth_class)

        objectness_mask = torch.argmax(objectness_score, 0) == 1
        grasp_score = grasp_score * grasp_tolerance / cfg.grasp_max_tolerance

        ns = grasp_angle.size(0)
        rotation_matrix = t_view_matrix(
            approaching.view(ns, 3), grasp_angle.view(ns)
        ).view(ns, 9)
        grasp_height = cfg.grasp_height * torch.ones_like(grasp_score)
        obj_ids = -1 * torch.ones_like(grasp_score)
        rows.append(
            torch.cat(
                [grasp_score, grasp_width, grasp_height, grasp_depth,
                 rotation_matrix, grasp_center, obj_ids], axis=-1,
            )
        )
        masks.append(objectness_mask)
    return torch.stack(rows), torch.stack(masks)


# ------------------------------------------------------------------------
# torch transcription of reference get_loss (models/loss.py:22-132)
# ------------------------------------------------------------------------


def t_get_loss(ep, num_angle):
    out = {}
    # --- compute_objectness_loss (loss.py:30-45) ---
    criterion = torch.nn.CrossEntropyLoss(reduction="mean")
    objectness_score = ep["objectness_score"]
    fp2_inds = ep["fp2_inds"].long()
    objectness_label = torch.gather(ep["objectness_label"], 1, fp2_inds)
    objectness_loss = criterion(objectness_score, objectness_label)
    objectness_pred = torch.argmax(objectness_score, 1)
    out["loss/stage1_objectness_loss"] = objectness_loss
    out["stage1_objectness_acc"] = (
        (objectness_pred == objectness_label.long()).float().mean()
    )
    out["stage1_objectness_prec"] = (
        (objectness_pred == objectness_label.long())[objectness_pred == 1].float().mean()
    )
    out["stage1_objectness_recall"] = (
        (objectness_pred == objectness_label.long())[objectness_label == 1].float().mean()
    )

    # --- compute_view_loss (loss.py:47-66) ---
    view_score = ep["view_score"]
    view_label = ep["batch_grasp_view_label"]
    v = view_label.size(2)
    obj_mask = (objectness_label > 0).unsqueeze(-1).repeat(1, 1, v)
    pos_view_pred_mask = (view_score >= 0.7) & obj_mask
    view_loss = ((view_score - view_label) ** 2)[obj_mask].mean()
    out["loss/stage1_view_loss"] = view_loss
    out["stage1_pos_view_pred_count"] = pos_view_pred_mask.long().sum()

    # --- compute_grasp_loss (loss.py:69-132) ---
    objectness_mask = torch.gather(ep["objectness_label"], 1, fp2_inds).bool()
    batch_grasp_label = ep["batch_grasp_label"]  # (B, Ns, A, D)
    batch_grasp_offset = ep["batch_grasp_offset"]  # (B, Ns, A, D, 3)
    batch_grasp_tolerance = ep["batch_grasp_tolerance"]
    a = num_angle

    top_view_grasp_widths = batch_grasp_offset[:, :, :, :, 2]
    target_labels_inds = torch.argmax(batch_grasp_label, dim=2, keepdim=True)
    target_labels = torch.gather(batch_grasp_label, 2, target_labels_inds).squeeze(2)
    target_widths = torch.gather(top_view_grasp_widths, 2, target_labels_inds).squeeze(2)
    target_tolerance = torch.gather(batch_grasp_tolerance, 2, target_labels_inds).squeeze(2)

    graspable_mask = target_labels > 0.1  # THRESH_BAD
    objectness_mask = objectness_mask.unsqueeze(-1).expand_as(graspable_mask)
    loss_mask = (objectness_mask & graspable_mask).float()

    target_labels_inds_ = target_labels_inds.transpose(1, 2)  # (B, 1, Ns, D)
    grasp_score = torch.gather(ep["grasp_score_pred"], 1, target_labels_inds_).squeeze(1)
    grasp_score_loss = t_huber(grasp_score - target_labels, delta=1.0)
    grasp_score_loss = torch.sum(grasp_score_loss * loss_mask) / (loss_mask.sum() + 1e-6)
    out["loss/stage2_grasp_score_loss"] = grasp_score_loss

    target_angles_cls = target_labels_inds.squeeze(2)  # (B, Ns, D)
    ce = torch.nn.CrossEntropyLoss(reduction="none")
    grasp_angle_class_score = ep["grasp_angle_cls_pred"]  # (B, A, Ns, D)
    grasp_angle_class_loss = ce(grasp_angle_class_score, target_angles_cls)
    grasp_angle_class_loss = torch.sum(grasp_angle_class_loss * loss_mask) / (
        loss_mask.sum() + 1e-6
    )
    out["loss/stage2_grasp_angle_class_loss"] = grasp_angle_class_loss
    grasp_angle_class_pred = torch.argmax(grasp_angle_class_score, 1)
    out["stage2_grasp_angle_class_acc/0_degree"] = (
        (grasp_angle_class_pred == target_angles_cls)[loss_mask.bool()].float().mean()
    )
    acc_mask_15 = (torch.abs(grasp_angle_class_pred - target_angles_cls) <= 1) | (
        torch.abs(grasp_angle_class_pred - target_angles_cls) >= a - 1
    )
    out["stage2_grasp_angle_class_acc/15_degree"] = (
        acc_mask_15[loss_mask.bool()].float().mean()
    )
    acc_mask_30 = (torch.abs(grasp_angle_class_pred - target_angles_cls) <= 2) | (
        torch.abs(grasp_angle_class_pred - target_angles_cls) >= a - 2
    )
    out["stage2_grasp_angle_class_acc/30_degree"] = (
        acc_mask_30[loss_mask.bool()].float().mean()
    )

    grasp_width_pred = torch.gather(ep["grasp_width_pred"], 1, target_labels_inds_).squeeze(1)
    grasp_width_loss = t_huber((grasp_width_pred - target_widths) / 0.1, delta=1)
    grasp_width_loss = torch.sum(grasp_width_loss * loss_mask) / (loss_mask.sum() + 1e-6)
    out["loss/stage2_grasp_width_loss"] = grasp_width_loss

    grasp_tolerance_pred = torch.gather(
        ep["grasp_tolerance_pred"], 1, target_labels_inds_
    ).squeeze(1)
    grasp_tolerance_loss = t_huber((grasp_tolerance_pred - target_tolerance) / 0.05, delta=1)
    grasp_tolerance_loss = torch.sum(grasp_tolerance_loss * loss_mask) / (
        loss_mask.sum() + 1e-6
    )
    out["loss/stage2_grasp_tolerance_loss"] = grasp_tolerance_loss

    grasp_loss = (
        grasp_score_loss + grasp_angle_class_loss + grasp_width_loss + grasp_tolerance_loss
    )
    out["loss/overall_loss"] = objectness_loss + view_loss + 0.2 * grasp_loss
    return out


# ------------------------------------------------------------------------
# fixtures / shared setup
# ------------------------------------------------------------------------


def _setup(rng, batch=2):
    cfg = GraspNetConfig.tiny()
    sd = make_reference_state_dict(cfg, rng)
    # scale conv weights down so activations stay O(1) through the 12-layer
    # stack (unit-variance weights blow magnitudes up and drown the f32
    # comparison); BN stats / biases keep their full random range
    sd = {k: (v * 0.25 if v.ndim >= 3 else v) for k, v in sd.items()}
    params = checkpoint.convert_torch_state_dict(sd)

    cloud = rng.uniform(-0.5, 0.5, (batch, cfg.num_point, 3)).astype(np.float32)
    x = jnp.asarray(cloud)
    sa_inds = {}
    cur = x
    for k, sa in (("sa1", cfg.sa1), ("sa2", cfg.sa2), ("sa3", cfg.sa3), ("sa4", cfg.sa4)):
        inds = ops.furthest_point_sample(cur, sa.npoint)
        sa_inds[k] = inds
        cur = ops.gather_points(cur, inds)
    return cfg, sd, params, cloud, x, sa_inds


def _shared_crop_idx(cloud, seed, rot, cfg):
    """The cylinder query indices exactly as crop_forward computes them."""
    return np.asarray(
        heads.cylinder_query_multi_depth(
            jnp.asarray(cloud), jnp.asarray(seed), jnp.asarray(rot),
            cfg.cylinder_radius, cfg.hmin, cfg.hmax_list, cfg.crop_nsample,
        )
    )


def _t(x):
    return torch.from_numpy(np.array(x))  # copy: jax buffers are read-only


# ------------------------------------------------------------------------
# tests
# ------------------------------------------------------------------------


def test_full_model_eval_matches_torch_transcription(rng):
    cfg, sd, params, cloud, x, sa_inds = _setup(rng)
    ep = graspnet_forward(params, x, cfg, train=False, labels={"sa_inds": sa_inds})
    grasps, valid = pred_decode(ep, cfg)

    fp2_t, seed_t = torch_backbone(sd, cfg, cloud, sa_inds)
    with torch.no_grad():
        ap = t_approach(
            sd, _t(np.transpose(fp2_t, (0, 2, 1))), cfg.num_view, training=False
        )
        # stage-1 parity (incl. identical tie-breaks in the view argmax)
        np.testing.assert_allclose(
            np.asarray(ep["objectness_score"]),
            ap["objectness_score"].numpy().transpose(0, 2, 1), atol=1e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ep["view_score"]), ap["view_score"].numpy(), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_array_equal(
            np.asarray(ep["grasp_top_view_inds"]), ap["grasp_top_view_inds"].numpy()
        )
        np.testing.assert_allclose(
            np.asarray(ep["grasp_top_view_rot"]),
            ap["grasp_top_view_rot"].numpy(), atol=1e-5,
        )

        idx = _shared_crop_idx(
            cloud, np.asarray(ep["fp2_xyz"]), np.asarray(ep["grasp_top_view_rot"]), cfg
        )
        vp_t = t_crop(sd, cloud, seed_t, ap["grasp_top_view_rot"].numpy(), idx, False)
        op = t_operation(sd, vp_t, cfg.num_angle, training=False)
        tol = t_tolerance(sd, vp_t, training=False)

    for key in ("grasp_score_pred", "grasp_angle_cls_pred", "grasp_width_pred"):
        np.testing.assert_allclose(
            np.asarray(ep[key]), op[key].numpy().transpose(0, 2, 1, 3),
            atol=1e-4, rtol=1e-4, err_msg=key,
        )
    np.testing.assert_allclose(
        np.asarray(ep["grasp_tolerance_pred"]),
        tol["grasp_tolerance_pred"].numpy().transpose(0, 2, 1, 3),
        atol=1e-4, rtol=1e-4,
    )

    # ---- pred_decode: 17-float rows + objectness mask ----
    tp = {
        "objectness_score": ap["objectness_score"],
        "grasp_top_view_xyz": ap["grasp_top_view_xyz"],
        "fp2_xyz": _t(ep["fp2_xyz"]),
        **op,
        **tol,
    }
    rows_t, mask_t = t_pred_decode(tp, cfg)
    np.testing.assert_array_equal(np.asarray(valid), mask_t.numpy())
    np.testing.assert_allclose(
        np.asarray(grasps), rows_t.numpy(), atol=2e-4, rtol=1e-4
    )


@pytest.mark.parametrize("train", [False, True], ids=["eval_epoch", "bn_train"])
def test_full_model_label_path_and_loss_matches_torch(rng, train):
    """Label-matched crop + get_loss vs the torch transcription.

    train=False is the reference eval epoch (net.eval() with is_training=True:
    BN running stats, crop at label points); train=True uses batch-stat BN.
    """
    cfg, sd, params, cloud, x, sa_inds = _setup(rng)
    b = cloud.shape[0]
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth

    scenes = []
    seed_np = []
    for i in range(b):
        s1 = np.asarray(sa_inds["sa1"][i])
        s2 = np.asarray(sa_inds["sa2"][i])
        seed_np.append(cloud[i][s1][s2])
        scenes.append(make_scene(rng, cfg))
    # label assignment must see the actual seed positions
    host = [
        lp.build_scene_labels(None, seed_np[i], *scenes[i][1:], cfg, max_objects=4)
        for i in range(b)
    ]
    labels = {k: jnp.asarray(np.stack([h[k] for h in host])) for k in host[0]}
    labels["sa_inds"] = sa_inds

    ep = graspnet_forward(params, x, cfg, train=train, labels=labels)
    objectness_label = rng.integers(0, 2, size=(b, cfg.num_point)).astype(np.int64)
    ep["objectness_label"] = jnp.asarray(objectness_label)
    loss_j, metrics_j = get_loss(ep, cfg)

    # ---- torch side: stage 1 ----
    fp2_t, seed_t = torch_backbone(sd, cfg, cloud, sa_inds, training=train)
    np.testing.assert_allclose(np.stack(seed_np), seed_t, atol=1e-6)
    with torch.no_grad():
        ap = t_approach(
            sd, _t(np.transpose(fp2_t, (0, 2, 1))), cfg.num_view, training=train
        )
    np.testing.assert_array_equal(
        np.asarray(ep["grasp_top_view_inds"]), ap["grasp_top_view_inds"].numpy()
    )
    top = ap["grasp_top_view_inds"].numpy()

    # ---- torch side: reference label pipeline (numpy transcription) + match
    oracle = [
        reference_label_oracle(seed_np[i], *scenes[i][1:], v, a, d, None)
        for i in range(b)
    ]
    raw_scores = np.stack([o["scores"] for o in oracle])  # (B, Ns, V, A, D)
    raw_widths = np.stack([o["widths"] for o in oracle])
    raw_tol = np.stack([o["tolerance"] for o in oracle])
    view_rot = np.stack([o["view_rot"] for o in oracle])  # (B, Ns, V, 3, 3)
    points = np.stack([o["points"] for o in oracle])  # (B, Ns, 3)
    mask = (raw_scores > 0) & (raw_widths <= cfg.grasp_max_width)
    u_max = raw_scores.max()
    lab = np.where(mask, np.log(u_max / np.where(mask, raw_scores, 1.0)), 0.0).astype(
        np.float32
    )
    view_label = lab.reshape(b, -1, v, a * d).max(-1)
    bi = np.arange(b)[:, None]
    si = np.arange(points.shape[1])[None, :]
    matched_label = lab[bi, si, top]  # (B, Ns, A, D)
    matched_width = raw_widths[bi, si, top]
    matched_tol = raw_tol[bi, si, top]
    matched_rot = view_rot[bi, si, top]  # (B, Ns, 3, 3)

    # my forward must have produced the same matched slabs
    np.testing.assert_allclose(np.asarray(ep["batch_grasp_point"]), points, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ep["batch_grasp_label"]), matched_label, atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ep["batch_grasp_view_rot"]), matched_rot, atol=1e-5
    )

    # ---- torch side: stage 2 at the label crop ----
    idx = _shared_crop_idx(
        cloud, np.asarray(ep["batch_grasp_point"]),
        np.asarray(ep["batch_grasp_view_rot"]), cfg,
    )
    with torch.no_grad():
        vp_t = t_crop(sd, cloud, points, matched_rot, idx, training=train)
        op = t_operation(sd, vp_t, cfg.num_angle, training=train)
        tol_p = t_tolerance(sd, vp_t, training=train)

    for key in ("grasp_score_pred", "grasp_angle_cls_pred", "grasp_width_pred"):
        np.testing.assert_allclose(
            np.asarray(ep[key]), op[key].numpy().transpose(0, 2, 1, 3),
            atol=2e-4, rtol=2e-4, err_msg=key,
        )

    # ---- torch side: get_loss ----
    offset = np.zeros(matched_width.shape + (3,), np.float32)
    offset[..., 2] = matched_width  # loss only consumes the width channel
    tep = {
        "objectness_score": ap["objectness_score"],
        "objectness_label": torch.from_numpy(objectness_label),
        "fp2_inds": _t(ep["fp2_inds"]),
        "view_score": ap["view_score"],
        "batch_grasp_view_label": torch.from_numpy(view_label.astype(np.float32)),
        "batch_grasp_label": torch.from_numpy(matched_label),
        "batch_grasp_offset": torch.from_numpy(offset),
        "batch_grasp_tolerance": torch.from_numpy(matched_tol.astype(np.float32)),
        **op,
        **tol_p,
        "grasp_tolerance_pred": tol_p["grasp_tolerance_pred"],
    }
    with torch.no_grad():
        want = t_get_loss(tep, cfg.num_angle)

    np.testing.assert_allclose(
        float(loss_j), float(want["loss/overall_loss"]), rtol=2e-4, atol=1e-5
    )
    for key, w in want.items():
        if key == "loss/overall_loss":
            continue
        got = metrics_j[key]
        np.testing.assert_allclose(
            np.float64(got), np.float64(w), rtol=2e-4, atol=1e-5, err_msg=key
        )
