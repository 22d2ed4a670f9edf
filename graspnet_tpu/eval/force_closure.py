"""Force-closure grasp scoring against object point clouds.

Equivalent of the dexnet quasi-static point-contact metric the graspnetAPI
evaluator uses (quality_method='force_closure'): a parallel-jaw grasp is in
force closure at friction mu iff the jaw closing line lies inside both
contact friction cones:

    |angle(closing_axis, n_i)| <= arctan(mu)   for both contacts i

Normals come from local-PCA estimation (unoriented, so the test uses
|cos|).  Contacts are the extreme points along the closing axis inside the
jaw volume.  Returns the minimal passing mu so the caller can threshold at
any friction level.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

FRICTIONS = np.array([0.2, 0.4, 0.6, 0.8, 1.0, 1.2], dtype=np.float32)


def estimate_normals(points: np.ndarray, k: int = 16, chunk: int = 1024) -> np.ndarray:
    """Unoriented per-point normals via k-NN PCA (smallest eigenvector).

    Neighbor search runs in float32 chunks with argpartition — O(chunk * n)
    memory instead of a dense (n, n) float64 matrix + full argsort, which at
    typical model-cloud sizes (10-20k points) costs GBs per eval worker.
    """
    pts = points.astype(np.float32, copy=False)
    n = len(pts)
    k = min(k, n)
    nbr = np.empty((n, k), dtype=np.int64)
    sq = np.sum(pts * pts, axis=1)
    for s in range(0, n, chunk):
        blk = pts[s : s + chunk]  # (c, 3)
        d2 = sq[s : s + chunk, None] + sq[None, :] - 2.0 * (blk @ pts.T)
        if k < n:
            part = np.argpartition(d2, k - 1, axis=1)[:, :k]
            # exact ascending order within the k nearest (stable result
            # regardless of argpartition's arbitrary internal order)
            sub = np.take_along_axis(d2, part, axis=1)
            nbr[s : s + chunk] = np.take_along_axis(
                part, np.argsort(sub, axis=1, kind="stable"), axis=1
            )
        else:
            nbr[s : s + chunk] = np.argsort(d2, axis=1, kind="stable")[:, :k]
    nbrs = pts[nbr]  # (n, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    return vecs[:, :, 0]  # (n, 3)


def find_contacts(
    model_points: np.ndarray,
    grasp: np.ndarray,
    finger_tol: float = 0.004,
) -> Optional[Tuple[int, int]]:
    """Contact point indices for a grasp against a model cloud (model frame
    already == grasp's world frame).

    grasp: one 17-float row. The jaw volume in the gripper frame is
    x in [depth - finger_length, depth], |y| <= width/2 + tol, |z| <= height/2
    (the decoder's gripper geometry, postproc/collision.py). Contacts are the
    min-y / max-y points in the volume (where the closing jaws first touch).
    """
    width, height, depth = grasp[1], grasp[2], grasp[3]
    R = grasp[4:13].reshape(3, 3)
    t = grasp[13:16]
    local = (model_points - t) @ R  # rows in gripper frame
    finger_length = 0.06
    inside = (
        (local[:, 0] > depth - finger_length)
        & (local[:, 0] < depth)
        & (np.abs(local[:, 1]) < width / 2 + finger_tol)
        & (np.abs(local[:, 2]) < height / 2)
    )
    idx = np.nonzero(inside)[0]
    if len(idx) < 2:
        return None
    ys = local[idx, 1]
    return int(idx[np.argmin(ys)]), int(idx[np.argmax(ys)])


def force_closure_min_friction(
    model_points: np.ndarray,
    normals: np.ndarray,
    grasp: np.ndarray,
    frictions: np.ndarray = FRICTIONS,
) -> float:
    """Minimal friction coefficient at which the grasp achieves force
    closure, or inf if it never does (incl. no contacts)."""
    contacts = find_contacts(model_points, grasp)
    if contacts is None:
        return float("inf")
    i, j = contacts
    axis = model_points[j] - model_points[i]
    norm = np.linalg.norm(axis)
    if norm < 1e-9:
        return float("inf")
    axis = axis / norm
    cos1 = abs(float(normals[i] @ axis))
    cos2 = abs(float(normals[j] @ axis))
    cos_min = min(cos1, cos2)
    for mu in frictions:
        # inside friction cone: angle <= arctan(mu) <=> cos >= 1/sqrt(1+mu^2)
        if cos_min >= 1.0 / np.sqrt(1.0 + mu * mu):
            return float(mu)
    return float("inf")


def grasp_scores(
    model_points: np.ndarray,
    normals: np.ndarray,
    grasps: np.ndarray,
    frictions: np.ndarray = FRICTIONS,
) -> np.ndarray:
    """Score each grasp as 1.1 - mu_min (graspnetAPI convention: higher is
    better, 0 for never-closing grasps)."""
    out = np.zeros(len(grasps), dtype=np.float32)
    for g in range(len(grasps)):
        mu = force_closure_min_friction(model_points, normals, grasps[g], frictions)
        out[g] = 0.0 if np.isinf(mu) else 1.1 - mu
    return out
