"""Synthetic GraspNet-1B mini-dataset generator for integration tests.

Writes the exact on-disk layout the framework's data layer expects
(SURVEY.md §2.4 / reference dataset/graspnet_dataset.py): scene dirs with
depth/label PNGs + meta.mat + camera poses, per-object grasp-label and
tolerance files, collision labels, and object model clouds — all tiny.
"""

from __future__ import annotations

import os

import numpy as np

H, W = 60, 80
FACTOR_DEPTH = 1000.0
INTRINSIC = np.array(
    [[100.0, 0.0, 40.0], [0.0, 100.0, 30.0], [0.0, 0.0, 1.0]], np.float64
)


def _write_scene(root, scene, camera, n_frames, obj_ids, rng):
    import scipy.io as scio
    from PIL import Image

    base = os.path.join(root, "scenes", scene, camera)
    for sub in ("depth", "label", "meta"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    # object blobs in the image: two rectangles
    label_img = np.zeros((H, W), np.uint8)
    label_img[10:40, 5:35] = obj_ids[0]
    label_img[10:50, 45:75] = obj_ids[1]

    poses = np.zeros((3, 4, len(obj_ids)), np.float64)
    for i in range(len(obj_ids)):
        poses[:, :3, i] = np.eye(3)
        poses[:, 3, i] = [0.0 if i == 0 else 0.15, 0.0, 0.5]

    for f in range(n_frames):
        depth = np.full((H, W), 500, np.uint16)  # 0.5 m plane
        depth += (rng.integers(0, 20, (H, W))).astype(np.uint16)
        Image.fromarray(depth).save(os.path.join(base, "depth", f"{f:04d}.png"))
        Image.fromarray(label_img).save(os.path.join(base, "label", f"{f:04d}.png"))
        scio.savemat(
            os.path.join(base, "meta", f"{f:04d}.mat"),
            {
                "intrinsic_matrix": INTRINSIC,
                "factor_depth": np.array([[FACTOR_DEPTH]]),
                "cls_indexes": np.array([obj_ids], np.int32),
                "poses": poses,
            },
        )
    eye = np.tile(np.eye(4, dtype=np.float64), (256, 1, 1))
    np.save(os.path.join(base, "camera_poses.npy"), eye)
    np.save(os.path.join(base, "cam0_wrt_table.npy"), np.eye(4))

    # collision labels: one boolean array per object in scene order
    np_label, v, a, d = 8, 60, 12, 4
    coll = {
        f"arr_{i}": rng.random((np_label, v, a, d)) < 0.1
        for i in range(len(obj_ids))
    }
    cdir = os.path.join(root, "collision_label", scene)
    os.makedirs(cdir, exist_ok=True)
    np.savez(os.path.join(cdir, "collision_labels.npz"), **coll)


def make_mini_dataset(
    root: str,
    camera: str = "realsense",
    n_objects: int = 3,
    n_frames: int = 2,
    num_view: int = 60,
    seed: int = 0,
) -> str:
    """Create the dataset under `root`; returns `root`.

    Scenes: scene_0000 (train split) and scene_0100 (test_seen split), each
    with `n_frames` frames and objects 1..2 (1-based label ids).
    """
    rng = np.random.default_rng(seed)
    np_label, a, d = 8, 12, 4

    os.makedirs(os.path.join(root, "grasp_label"), exist_ok=True)
    os.makedirs(os.path.join(root, "tolerance"), exist_ok=True)
    for i in range(n_objects):
        pts = rng.uniform(-0.04, 0.04, (np_label, 3)).astype(np.float32)
        offsets = np.zeros((np_label, num_view, a, d, 3), np.float32)
        offsets[..., 0] = rng.uniform(0, np.pi, offsets.shape[:-1])  # angle
        offsets[..., 1] = rng.uniform(0.01, 0.04, offsets.shape[:-1])  # depth
        offsets[..., 2] = rng.uniform(0.02, 0.09, offsets.shape[:-1])  # width
        scores = rng.uniform(0.1, 1.1, (np_label, num_view, a, d)).astype(
            np.float32
        )
        np.savez(
            os.path.join(root, "grasp_label", f"{i:03d}_labels.npz"),
            points=pts,
            offsets=offsets,
            scores=scores,
        )
        np.save(
            os.path.join(root, "tolerance", f"{i:03d}_tolerance.npy"),
            rng.uniform(0.0, 0.05, (np_label, num_view, a, d)).astype(np.float32),
        )
        mdir = os.path.join(root, "models", f"{i:03d}")
        os.makedirs(mdir, exist_ok=True)
        np.savez(
            os.path.join(mdir, "cloud.npz"),
            points=rng.uniform(-0.05, 0.05, (200, 3)).astype(np.float32),
        )

    obj_ids = [1, 2]  # 1-based ids present in the scenes
    _write_scene(root, "scene_0000", camera, n_frames, obj_ids, rng)
    _write_scene(root, "scene_0100", camera, n_frames, obj_ids, rng)
    return root
