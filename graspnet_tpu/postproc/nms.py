"""Grasp pose NMS.

Greedy non-maximum suppression over 6-DoF grasp poses: grasps are visited in
descending score order; a grasp is suppressed if both its translation distance
AND its rotation geodesic angle to an already-kept grasp fall below the
thresholds.  This matches graspnetAPI's GraspGroup.nms contract (defaults
0.03 m / 30°) used by every reference demo (e.g. image_demo.py top-50 viz).
"""

from __future__ import annotations

import numpy as np


def rotation_angles(R1: np.ndarray, R2: np.ndarray) -> np.ndarray:
    """Geodesic angle between rotation matrices, broadcast over leading dims."""
    tr = np.einsum("...ij,...ij->...", R1, R2)  # trace(R1^T R2)
    cos = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.arccos(cos)


def grasp_nms(
    grasp_array: np.ndarray,
    translation_thresh: float = 0.03,
    rotation_thresh: float = 30.0 / 180.0 * np.pi,
) -> np.ndarray:
    """Return indices (into grasp_array) of kept grasps, descending by score."""
    m = len(grasp_array)
    if m == 0:
        return np.zeros((0,), dtype=np.int64)
    scores = grasp_array[:, 0]
    T = grasp_array[:, 13:16]
    R = grasp_array[:, 4:13].reshape(-1, 3, 3)
    order = np.argsort(-scores, kind="stable")

    # pairwise suppression predicate, computed once (M is small post-decode)
    dt = np.linalg.norm(T[:, None, :] - T[None, :, :], axis=-1)
    dr = rotation_angles(R[:, None], R[None, :])
    close = (dt < translation_thresh) & (dr < rotation_thresh)

    keep = []
    suppressed = np.zeros(m, dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= close[i]
    return np.asarray(keep, dtype=np.int64)
