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
    T = np.ascontiguousarray(grasp_array[:, 13:16])
    Rf = np.ascontiguousarray(grasp_array[:, 4:13])  # row-major 3x3 flat
    order = np.argsort(-scores, kind="stable")
    tt2 = translation_thresh * translation_thresh
    cos_rt = np.cos(rotation_thresh)

    from graspnet_tpu import native

    # fused C++ path: predicate evaluated on the fly for kept rows only,
    # no (M, M) temporaries
    keep = native.grasp_nms_fused(T, Rf, order, tt2, cos_rt)
    if keep is not None:
        return keep

    # numpy fallback: the pairwise predicate via two small matmuls —
    # trace(R1^T R2) is the elementwise dot of the flattened matrices, and
    # |t1 - t2|^2 expands to norms + dot
    tr = Rf @ Rf.T  # (M, M) = trace(R_a^T R_b)
    cos = np.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    tn = np.sum(T * T, axis=1)
    d2 = tn[:, None] + tn[None, :] - 2.0 * (T @ T.T)
    close = (d2 < tt2) & (cos > cos_rt)
    return native.greedy_suppress(close, order)
