"""Deliberately naive, independent reimplementation of the GraspNet AP
protocol (graspnetAPI eval_grasp / GraspNetEval.eval_scene, consumed by the
reference at test.py:110-114) for fuzz cross-checks of graspnet_tpu.eval.

Shares NO code with graspnet_tpu.eval / graspnet_tpu.postproc: every stage is
plain per-element Python/numpy loops written straight from the protocol
description — greedy NMS, nearest-point object assignment, per-object top-10
+ global top-50 min-score cut, gripper-volume collision + empty-jaw test,
dexnet two-contact force closure, and the (50, 6) accuracy matrix.  Slow on
purpose; use tiny scenes.
"""

import numpy as np

FRICTIONS = [0.2, 0.4, 0.6, 0.8, 1.0, 1.2]
TOP_K = 50
PER_OBJECT_TOP = 10
EMPTY_THRESH = 10
DEPTH_BASE = 0.02
FINGER_WIDTH = 0.01
TUBE_RADIUS = 0.005


def naive_nms(grasps, tt=0.03, rt=30.0 / 180.0 * np.pi):
    """Greedy NMS: visit desc-score (stable); suppress when BOTH the
    translation distance and rotation geodesic to a kept grasp are under
    the thresholds.  Returns kept rows in visit order."""
    order = sorted(range(len(grasps)), key=lambda i: (-grasps[i][0], i))
    kept = []
    for i in order:
        ok = True
        for j in kept:
            t_d = np.linalg.norm(grasps[i][13:16] - grasps[j][13:16])
            tr = float(np.sum(grasps[i][4:13] * grasps[j][4:13]))
            ang = np.arccos(np.clip((tr - 1.0) / 2.0, -1.0, 1.0))
            if t_d * t_d < tt * tt and np.cos(rt) < np.cos(ang):
                ok = False
                break
        if ok:
            kept.append(i)
    return np.array([grasps[i] for i in kept]).reshape(len(kept), 17)


def naive_assign(grasps, posed_clouds):
    """Per grasp: object owning the globally nearest scene point."""
    out = []
    for g in grasps:
        best_d, best_o = np.inf, -1
        for oi, pts in enumerate(posed_clouds):
            for p in pts:
                d = np.linalg.norm(g[13:16] - p)
                if d < best_d:
                    best_d, best_o = d, oi
        out.append(best_o)
    return out


def naive_collision_empty(g, scene_points):
    """Gripper-volume collision + empty-jaw test + inner centroid."""
    width, height, depth = g[1], g[2], g[3]
    rot = g[4:13].reshape(3, 3)
    t = g[13:16]
    inner_pts = []
    collision = False
    for p in scene_points:
        q = rot.T @ (p - t)
        in_h = -height / 2 < q[2] < height / 2
        in_x = -DEPTH_BASE < q[0] < depth
        left = in_h and in_x and -(width / 2 + FINGER_WIDTH) < q[1] < -width / 2
        right = in_h and in_x and width / 2 < q[1] < width / 2 + FINGER_WIDTH
        bottom = (
            in_h
            and -(DEPTH_BASE + FINGER_WIDTH) < q[0] <= -DEPTH_BASE
            and -(width / 2 + FINGER_WIDTH) < q[1] < width / 2 + FINGER_WIDTH
        )
        if left or right or bottom:
            collision = True
        if in_h and in_x and -width / 2 <= q[1] <= width / 2:
            inner_pts.append(q)
    empty = len(inner_pts) < EMPTY_THRESH
    centroid = (
        np.mean(np.asarray(inner_pts), axis=0)
        if inner_pts
        else np.zeros(3)
    )
    return collision, empty, centroid


def naive_normals(points, k=16):
    """k-NN PCA normals (smallest eigenvector), brute force."""
    pts = np.asarray(points, np.float32)
    out = np.zeros((len(pts), 3))
    for i in range(len(pts)):
        d = [float(np.linalg.norm(pts[i].astype(np.float32) - p)) for p in pts]
        nbr = pts[np.argsort(d, kind="stable")[: min(k, len(pts))]]
        c = nbr - nbr.mean(axis=0)
        cov = (c.T @ c) / len(nbr)
        w, v = np.linalg.eigh(cov)
        out[i] = v[:, 0]
    return out


def naive_min_friction(model_pts, normals, center, axis, width):
    """First-crossing contacts in a tube, then minimal passing friction."""
    cands = []
    for i, p in enumerate(model_pts):
        rel = p - center
        s = float(rel @ axis)
        r2 = float(rel @ rel) - s * s
        if r2 <= TUBE_RADIUS * TUBE_RADIUS and -width / 2 <= s <= width / 2:
            cands.append((s, i))
    if not cands:
        return -1.0
    # first-index tie-break on both ends, matching argmin/argmax semantics
    s_min, i_minus = np.inf, -1
    s_max, i_plus = -np.inf, -1
    for s, i in cands:
        if s < s_min:
            s_min, i_minus = s, i
        if s > s_max:
            s_max, i_plus = s, i
    if i_minus == i_plus:
        return -1.0
    p1, n1 = model_pts[i_minus], normals[i_minus]
    p2, n2 = model_pts[i_plus], normals[i_plus]
    diff = p2 - p1
    norm = float(np.linalg.norm(diff))
    if norm < 1e-9:
        return -1.0
    for mu in FRICTIONS:
        cos_th = 1.0 / np.sqrt(1.0 + mu * mu)
        c1 = abs(float(n1 @ diff)) / (norm * float(np.linalg.norm(n1)))
        c2 = abs(float(n2 @ diff)) / (norm * float(np.linalg.norm(n2)))
        if c1 >= cos_th and c2 >= cos_th:
            return float(mu)
    return -1.0


def naive_eval_frame(grasps, model_clouds, model_normals, poses, table=None):
    """(TOP_K, 6) accuracy matrix — the whole protocol, naively."""
    zeros = np.zeros((TOP_K, len(FRICTIONS)), dtype=np.float32)
    if len(grasps) == 0 or len(model_clouds) == 0:
        return zeros
    grasps = naive_nms(grasps)

    posed = [
        np.asarray([p[:3, :3] @ q + p[:3, 3] for q in pts])
        for pts, p in zip(model_clouds, poses)
    ]
    owner = naive_assign(grasps, posed)

    # top-10 per object by confidence
    pre = []
    for oi in range(len(posed)):
        rows = [g for g, o in zip(grasps, owner) if o == oi]
        rows.sort(key=lambda g: -g[0])
        pre.append(rows[:PER_OBJECT_TOP])
    flat = sorted([g[0] for rows in pre for g in rows], reverse=True)
    if not flat:
        return zeros
    min_score = flat[min(TOP_K - 1, len(flat) - 1)]
    kept = [[g for g in rows if g[0] >= min_score] for rows in pre]

    scene = np.concatenate(posed, axis=0)
    if table is not None:
        scene = np.concatenate([scene, table], axis=0)
    scored = []
    for oi, rows in enumerate(kept):
        R, t = poses[oi][:3, :3], poses[oi][:3, 3]
        for g in rows:
            coll, empty, centroid = naive_collision_empty(g, scene)
            if coll or empty:
                scored.append((g[0], -1.0))
                continue
            rot = g[4:13].reshape(3, 3)
            center_cam = g[13:16] + rot @ centroid
            center_obj = R.T @ (center_cam - t)
            axis_obj = R.T @ rot[:, 1]
            mu = naive_min_friction(
                np.asarray(model_clouds[oi]), np.asarray(model_normals[oi]),
                center_obj, axis_obj, float(g[1]),
            )
            scored.append((g[0], mu))
    if not scored:
        return zeros
    scored.sort(key=lambda x: -x[0])
    acc = np.zeros((TOP_K, len(FRICTIONS)), dtype=np.float32)
    for k in range(TOP_K):
        top = scored[: k + 1]
        for fi, mu in enumerate(FRICTIONS):
            n_hit = sum(1 for _, s in top if 0 < s <= mu)
            acc[k, fi] = n_hit / (k + 1)
    return acc
