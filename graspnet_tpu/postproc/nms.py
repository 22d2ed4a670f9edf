"""Grasp pose NMS.

Greedy non-maximum suppression over 6-DoF grasp poses: grasps are visited in
descending score order; a grasp is suppressed if both its translation distance
AND its rotation geodesic angle to an already-kept grasp fall below the
thresholds.  This matches graspnetAPI's GraspGroup.nms contract (defaults
0.03 m / 30°) used by every reference demo (e.g. image_demo.py top-50 viz).

Two implementations: a host path (fused C++ kernel with numpy fallback) for
the GraspGroup API, and a jit-able device path (`nms_top_k`) that runs inside
the serving program — the pairwise predicate lands on the MXU as two small
matmuls and the greedy pass is a lax.fori_loop over masks, so a frame ships
only its top-K rows off the chip.
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


# ------------------------------------------------------------ device path --


def nms_keep_mask(
    grasps,
    valid,
    translation_thresh: float = 0.03,
    rotation_thresh: float = 30.0 / 180.0 * np.pi,
):
    """Jit-able greedy NMS for one scene: (Ns, 17), (Ns,) -> (Ns,) keep mask.

    Semantics match grasp_nms() exactly (descending-score visit order with
    stable ties, suppress-if-close); invalid rows are neither kept nor
    allowed to suppress.
    """
    import jax
    import jax.numpy as jnp

    ns = grasps.shape[0]
    # NaN scores sort last under numpy's argsort(-scores) (after -inf), so
    # the visit-order key maps NaN -> -inf and breaks the tie with a nan
    # flag — without this a NaN row would have no predecessors and could
    # never be suppressed, diverging from grasp_nms().
    nan = jnp.isnan(grasps[:, 0]) & valid
    scores = jnp.where(valid & ~nan, grasps[:, 0], -jnp.inf)
    t = grasps[:, 13:16]
    rf = grasps[:, 4:13]

    # pairwise predicate on the MXU: two (Ns, Ns) matmuls
    tr = rf @ rf.T
    cos = (tr - 1.0) * 0.5
    tn = jnp.sum(t * t, axis=1)
    d2 = tn[:, None] + tn[None, :] - 2.0 * (t @ t.T)
    close = (
        (d2 < translation_thresh * translation_thresh)
        & (cos > jnp.cos(rotation_thresh))
        & valid[None, :]
        & valid[:, None]
    )

    # Greedy NMS is the unique solution of the boolean recurrence (in
    # descending-score visit order)  keep_i = valid_i AND NOT OR_{j prec i}
    # (close_ij AND keep_j).  A 1024-step sequential loop costs ~7 us per
    # iteration in While overhead on TPU; instead solve by Jacobi sweeps:
    # each sweep is one (Ns, Ns) @ (Ns,) matvec on the MXU, and because the
    # precedence relation is a strict total order (score desc, index asc on
    # ties — exactly the stable argsort's visit order), entries with
    # dependency depth <= t are exact and frozen after t sweeps — a reached
    # fixpoint IS the greedy solution.  Typical suppression chains are a few
    # deep, so this converges in a handful of sweeps (hard cap ns).
    #
    # Folding the precedence into the predicate matrix (rather than sorting
    # the matrix with close[order][:, order]) avoids an argsort plus two
    # (Ns, Ns) axis gathers — the gathers dominated this function's cost.
    idx = jnp.arange(ns)
    ties = (scores[None, :] == scores[:, None]) & (
        (nan[:, None] & ~nan[None, :])
        | ((nan[:, None] == nan[None, :]) & (idx[None, :] < idx[:, None]))
    )
    prec = (scores[None, :] > scores[:, None]) | ties
    a = (close & prec).astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < ns)

    def body(state):
        keep, _, it = state
        sup = (a @ keep.astype(jnp.float32)) > 0
        return valid & ~sup, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros(ns, bool), jnp.int32(0))
    )
    return keep


def nms_top_k(
    grasps,
    valid,
    k: int = 50,
    translation_thresh: float = 0.03,
    rotation_thresh: float = 30.0 / 180.0 * np.pi,
):
    """Device NMS + top-K for the serving program.

    (Ns, 17), (Ns,) -> (K, 17) rows in descending score order, (K,) validity.
    vmap over the batch axis for multi-frame programs.
    """
    import jax
    import jax.numpy as jnp

    keep = nms_keep_mask(grasps, valid, translation_thresh, rotation_thresh)
    # Rank NaN-scored survivors as -inf so they can never displace real
    # grasps from the K slots (XLA's top_k total order sorts NaN high);
    # they come out flagged invalid.
    scores = jnp.where(keep & ~jnp.isnan(grasps[:, 0]), grasps[:, 0], -jnp.inf)
    # a K above the candidate count means "no truncation": every row already
    # fits, so clamp instead of crashing in lax.top_k (service callers pass
    # arbitrary top_k values)
    top_scores, top_idx = jax.lax.top_k(scores, min(k, scores.shape[0]))
    rows = jnp.take(grasps, top_idx, axis=0)
    return rows, jnp.isfinite(top_scores)
