"""Model-free collision detection for grasp candidates.

Re-implementation of reference utils/collision_detector.py with the compute
path in JAX so the (M grasps x N points) mask reductions run on TPU fused with
the decode rollout, while keeping a numpy API for host callers.

Geometry (collision_detector.py:75-112): scene points are transformed into
each gripper frame (targets = (points - T) @ R), then boolean volumes are
tested for the left/right finger, the bottom plate, and the approach-shift
corridor; a grasp collides when inside-count / analytic-voxel-volume exceeds
the threshold.  finger_width=0.01, finger_length=0.06 fixed, as in reference.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu.postproc.voxel import voxel_down_sample

FINGER_WIDTH = 0.01
FINGER_LENGTH = 0.06


@functools.partial(jax.jit, static_argnames=("approach_dist", "voxel_size"))
def collision_ious(
    scene_points: jax.Array,
    translations: jax.Array,
    rotations: jax.Array,
    heights: jax.Array,
    depths: jax.Array,
    widths: jax.Array,
    *,
    approach_dist: float = 0.03,
    voxel_size: float = 0.005,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-grasp collision IoUs against a (already downsampled) scene cloud.

    Args:
      scene_points: (N, 3) voxel-downsampled scene.
      translations: (M, 3); rotations: (M, 3, 3); heights/depths/widths: (M,).

    Returns:
      global_iou (M,), part_ious (M, 4) [left,right,bottom,shifting],
      inner_count (M,) points inside the gripper volume (for empty-grasp).
    """
    approach_dist = max(approach_dist, FINGER_WIDTH)
    # (M, N, 3) gripper-frame coordinates
    targets = jnp.einsum(
        "mnj,mjk->mnk", scene_points[None, :, :] - translations[:, None, :], rotations
    )
    h = heights[:, None]
    d = depths[:, None]
    w = widths[:, None]
    tx, ty, tz = targets[..., 0], targets[..., 1], targets[..., 2]

    mask1 = (tz > -h / 2) & (tz < h / 2)
    mask2 = (tx > d - FINGER_LENGTH) & (tx < d)
    mask3 = ty > -(w / 2 + FINGER_WIDTH)
    mask4 = ty < -w / 2
    mask5 = ty < (w / 2 + FINGER_WIDTH)
    mask6 = ty > w / 2
    mask7 = (tx <= d - FINGER_LENGTH) & (tx > d - FINGER_LENGTH - FINGER_WIDTH)
    mask8 = (tx <= d - FINGER_LENGTH - FINGER_WIDTH) & (
        tx > d - FINGER_LENGTH - FINGER_WIDTH - approach_dist
    )

    left = mask1 & mask2 & mask3 & mask4
    right = mask1 & mask2 & mask5 & mask6
    bottom = mask1 & mask3 & mask5 & mask7
    shifting = mask1 & mask3 & mask5 & mask8
    global_mask = left | right | bottom | shifting

    v3 = voxel_size**3
    lr_vol = (heights * FINGER_LENGTH * FINGER_WIDTH) / v3
    bottom_vol = (heights * (widths + 2 * FINGER_WIDTH) * FINGER_WIDTH) / v3
    shift_vol = (heights * (widths + 2 * FINGER_WIDTH) * approach_dist) / v3
    volume = lr_vol * 2 + bottom_vol + shift_vol

    global_iou = jnp.sum(global_mask, axis=1) / (volume + 1e-6)
    part_ious = jnp.stack(
        [
            jnp.sum(left, axis=1) / (lr_vol + 1e-6),
            jnp.sum(right, axis=1) / (lr_vol + 1e-6),
            jnp.sum(bottom, axis=1) / (bottom_vol + 1e-6),
            jnp.sum(shifting, axis=1) / (shift_vol + 1e-6),
        ],
        axis=1,
    )
    inner = mask1 & mask2 & (~mask4) & (~mask6)
    return global_iou, part_ious, jnp.sum(inner, axis=1)


@functools.partial(
    jax.jit, static_argnames=("approach_dist", "voxel_size", "block")
)
def collision_counts_blocked(
    scene_points: jax.Array,  # (Npad, 3), padding = +1e9 sentinel
    translations: jax.Array,  # (Mpad, 3)
    rotations: jax.Array,  # (Mpad, 3, 3)
    heights: jax.Array,
    depths: jax.Array,
    widths: jax.Array,
    *,
    approach_dist: float = 0.03,
    voxel_size: float = 0.005,
    block: int = 8192,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Streaming collision IoUs: O(block x M) memory, matmuls on the MXU.

    Same math as collision_ious but never materializes the (M, N, 3)
    gripper-frame tensor: per N-block, the three coordinate planes are
    (Nb, 3) @ (3, M) matmuls (tx[n,m] = <s_n, r_m^col0> - <t_m, r_m^col0>),
    and only the per-grasp mask COUNTS survive the lax.scan.  Shapes are
    padding-friendly: sentinel points at +1e9 fail every volume test.
    """
    approach_dist = max(approach_dist, FINGER_WIDTH)
    n = scene_points.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    pts = jnp.pad(scene_points, ((0, pad), (0, 0)), constant_values=1e9)
    pts = pts.reshape(nb, block, 3)

    # proj[m, k] = sum_j t[m, j] * r[m, j, k]  (the grasp-center projection)
    proj = jnp.einsum("mj,mjk->mk", translations, rotations)
    h = heights[None, :]
    d = depths[None, :]
    w = widths[None, :]

    def body(acc, sb):  # sb: (block, 3)
        tx = sb @ rotations[:, :, 0].T - proj[None, :, 0]  # (block, M)
        ty = sb @ rotations[:, :, 1].T - proj[None, :, 1]
        tz = sb @ rotations[:, :, 2].T - proj[None, :, 2]

        mask1 = (tz > -h / 2) & (tz < h / 2)
        mask2 = (tx > d - FINGER_LENGTH) & (tx < d)
        mask3 = ty > -(w / 2 + FINGER_WIDTH)
        mask4 = ty < -w / 2
        mask5 = ty < (w / 2 + FINGER_WIDTH)
        mask6 = ty > w / 2
        mask7 = (tx <= d - FINGER_LENGTH) & (tx > d - FINGER_LENGTH - FINGER_WIDTH)
        mask8 = (tx <= d - FINGER_LENGTH - FINGER_WIDTH) & (
            tx > d - FINGER_LENGTH - FINGER_WIDTH - approach_dist
        )
        left = mask1 & mask2 & mask3 & mask4
        right = mask1 & mask2 & mask5 & mask6
        bottom = mask1 & mask3 & mask5 & mask7
        shifting = mask1 & mask3 & mask5 & mask8
        inner = mask1 & mask2 & (~mask4) & (~mask6)
        counts = jnp.stack(
            [
                jnp.sum(left, axis=0),
                jnp.sum(right, axis=0),
                jnp.sum(bottom, axis=0),
                jnp.sum(shifting, axis=0),
                jnp.sum(inner, axis=0),
            ],
            axis=0,
        )  # (5, M)
        return acc + counts, None

    m = translations.shape[0]
    counts, _ = jax.lax.scan(body, jnp.zeros((5, m), jnp.int32), pts)
    left_c, right_c, bottom_c, shift_c, inner_c = counts

    v3 = voxel_size**3
    lr_vol = (heights * FINGER_LENGTH * FINGER_WIDTH) / v3
    bottom_vol = (heights * (widths + 2 * FINGER_WIDTH) * FINGER_WIDTH) / v3
    shift_vol = (heights * (widths + 2 * FINGER_WIDTH) * approach_dist) / v3
    volume = lr_vol * 2 + bottom_vol + shift_vol
    global_iou = (left_c + right_c + bottom_c + shift_c) / (volume + 1e-6)
    part_ious = jnp.stack(
        [
            left_c / (lr_vol + 1e-6),
            right_c / (lr_vol + 1e-6),
            bottom_c / (bottom_vol + 1e-6),
            shift_c / (shift_vol + 1e-6),
        ],
        axis=1,
    )
    return global_iou, part_ious, inner_c


def _bucket(n: int, quantum: int) -> int:
    return max(quantum, -(-n // quantum) * quantum)


@functools.partial(
    jax.jit, static_argnames=("approach_dist", "voxel_size", "block")
)
def _collision_counts_rows_batch(
    pts: jax.Array,  # (B, Npad, 3), padding = +1e9 sentinel
    rows: jax.Array,  # (B, Mpad, 17) grasp rows, padding = identity rotation
    *,
    approach_dist: float,
    voxel_size: float,
    block: int = 8192,
):
    """Batched collision counts from packed (17-float) grasp rows.

    One transfer + one dispatch + one fetch for a whole eval batch — the
    per-frame detect() path pays a tunnel/PCIe round trip per frame AND one
    per grasp-parameter array; here the rows are unpacked on device.
    """

    def one(p, r):
        return collision_counts_blocked(
            p,
            r[:, 13:16],
            r[:, 4:13].reshape(-1, 3, 3),
            r[:, 2],
            r[:, 3],
            r[:, 1],
            approach_dist=approach_dist,
            voxel_size=voxel_size,
            block=block,
        )

    return jax.vmap(one)(pts, rows)


def detect_batch(
    scene_clouds,
    grasp_groups,
    *,
    voxel_size: float = 0.005,
    approach_dist: float = 0.03,
    collision_thresh: float = 0.05,
    pre_downsampled: bool = False,
):
    """Per-frame collision masks for a whole batch in ONE device round trip.

    Mask-identical to running ModelFreeCollisionDetector(cloud).detect(gg)
    per frame (counts are integer sums over sentinel-padded points, so the
    shared bucketing changes nothing — pinned in tests/test_postproc.py).

    Args:
      scene_clouds: list of (Ni, 3) raw clouds (voxel-downsampled here), or
        already-downsampled clouds when pre_downsampled=True.
      grasp_groups: list of GraspGroup (len == len(scene_clouds)).

    Returns:
      list of (mi,) bool collision masks, one per frame.
    """
    from graspnet_tpu import native

    assert len(scene_clouds) == len(grasp_groups)
    b = len(grasp_groups)
    if b == 0:
        return []
    if pre_downsampled:
        ds = [np.asarray(c, np.float32) for c in scene_clouds]
    else:
        ds = [
            native.voxel_downsample(np.asarray(c, np.float32), voxel_size)
            for c in scene_clouds
        ]
    ms = [len(g.grasp_group_array) for g in grasp_groups]
    if max(ms) == 0:
        return [np.zeros((0,), bool) for _ in range(b)]
    mp = _bucket(max(ms), 256)
    npad = _bucket(max(len(c) for c in ds), 8192)
    rows = np.zeros((b, mp, 17), np.float32)
    rows[:, :, 4:13] = np.eye(3).reshape(9)  # valid rotations for padding
    pts = np.full((b, npad, 3), 1e9, np.float32)
    for i, (c, g) in enumerate(zip(ds, grasp_groups)):
        pts[i, : len(c)] = c
        rows[i, : ms[i]] = g.grasp_group_array
    global_iou, _, _ = jax.device_get(
        _collision_counts_rows_batch(
            jnp.asarray(pts),
            jnp.asarray(rows),
            approach_dist=float(max(approach_dist, FINGER_WIDTH)),
            voxel_size=float(voxel_size),
        )
    )
    return [global_iou[i, : ms[i]] > collision_thresh for i in range(b)]


class ModelFreeCollisionDetector:
    """Drop-in equivalent of the reference detector (collision_detector.py:10).

    Shapes are bucketed (grasps to multiples of 256, scene points to
    multiples of 8192) so repeated frames hit the jit cache instead of
    recompiling per (M, N) pair, and the IoU pass streams N-blocks so
    memory stays O(block x M) even for ~1M-point service clouds.
    """

    def __init__(self, scene_points: np.ndarray, voxel_size: float = 0.005):
        from graspnet_tpu import native

        self.voxel_size = voxel_size
        self.finger_width = FINGER_WIDTH
        self.finger_length = FINGER_LENGTH
        self.scene_points = native.voxel_downsample(
            np.asarray(scene_points), voxel_size
        )

    def detect(
        self,
        grasp_group,
        approach_dist: float = 0.03,
        collision_thresh: float = 0.05,
        return_empty_grasp: bool = False,
        empty_thresh: float = 0.01,
        return_ious: bool = False,
    ):
        g = grasp_group.grasp_group_array
        m = len(g)
        if m == 0:
            empty = np.zeros((0,), bool)
            if not (return_empty_grasp or return_ious):
                return empty
            ret = [empty]
            if return_empty_grasp:
                ret.append(np.zeros((0,), bool))
            if return_ious:
                ret.append([np.zeros((0,)) for _ in range(5)])
            return ret
        mp = _bucket(m, 256)
        npad = _bucket(len(self.scene_points), 8192)
        gp = np.zeros((1, mp, 17), np.float32)
        gp[0, :m] = g
        gp[0, m:, 4:13] = np.eye(3).reshape(9)  # valid rotations for padding
        pts = np.full((1, npad, 3), 1e9, np.float32)
        pts[0, : len(self.scene_points)] = self.scene_points
        # packed rows: two host->device transfers total (the grasp
        # parameters are unpacked on device), not one per parameter array
        global_iou, part_ious, inner_count = jax.device_get(
            _collision_counts_rows_batch(
                jnp.asarray(pts),
                jnp.asarray(gp),
                approach_dist=float(max(approach_dist, FINGER_WIDTH)),
                voxel_size=float(self.voxel_size),
            )
        )
        global_iou = global_iou[0, :m]
        part_ious = part_ious[0, :m]
        inner_count = inner_count[0, :m]
        collision_mask = global_iou > collision_thresh
        if not (return_empty_grasp or return_ious):
            return collision_mask
        ret = [collision_mask]
        if return_empty_grasp:
            heights, widths = g[:, 2], g[:, 1]
            inner_vol = heights * self.finger_length * widths / (self.voxel_size**3)
            ret.append(inner_count / inner_vol < empty_thresh)
        if return_ious:
            ret.append(
                [global_iou, part_ious[:, 0], part_ious[:, 1], part_ious[:, 2], part_ious[:, 3]]
            )
        return ret
