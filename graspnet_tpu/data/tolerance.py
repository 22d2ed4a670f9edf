"""Offline tolerance-label generation.

Re-implementation of reference dataset/generate_tolerance_label.py:81-95,
vectorized: for each label point p and each (view, angle, depth) cell, the
tolerance is the largest radius r in {0, 1, ..., 50} mm such that among the
label points within r of p, at least `pos_ratio_thresh` have a positive
friction score <= `mu_thresh`.  The reference runs one python process per
point (a hand-rolled 50-way pool); here the whole object is one batched JAX
computation over the (P, P) distance matrix and all 51 radii — minutes of
multiprocessing become a single device pass.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

RADIUS_LIST = [0.001 * x for x in range(51)]


@functools.partial(jax.jit, static_argnames=("pos_ratio_thresh", "mu_thresh", "chunk"))
def _tolerance_chunk(
    dists_chunk: jax.Array,  # (C, P) distances from chunk points to all points
    scores: jax.Array,  # (P, V, A, D)
    pos_ratio_thresh: float = 0.8,
    mu_thresh: float = 0.55,
    chunk: int = 0,
) -> jax.Array:
    pos = ((scores > 0) & (scores <= mu_thresh)).astype(jnp.float32)  # (P,V,A,D)
    p = scores.shape[0]
    pos_flat = pos.reshape(p, -1)  # (P, VAD)
    radii = jnp.asarray(RADIUS_LIST, jnp.float32)

    def per_radius(r):
        mask = (dists_chunk <= r).astype(jnp.float32)  # (C, P)
        cnt = jnp.sum(mask, axis=1, keepdims=True)  # (C, 1) — never 0 (self)
        pos_cnt = mask @ pos_flat  # (C, VAD) on the MXU
        return (pos_cnt / cnt) >= pos_ratio_thresh  # (C, VAD)

    ok = jax.vmap(per_radius)(radii)  # (R, C, VAD)
    # reference stops scanning radii at the first one where NO cell passes
    # (generate_tolerance_label.py:90-91); emulate with a cumulative AND so a
    # non-monotone pos_ratio cannot resurrect later radii
    alive = jnp.cumprod(jnp.any(ok, axis=2).astype(jnp.int32), axis=0).astype(bool)
    ok = ok & alive[:, :, None]
    # tolerance = largest surviving r per cell (:92)
    tol = jnp.max(jnp.where(ok, radii[:, None, None], 0.0), axis=0)  # (C, VAD)
    return tol


def generate_tolerance(
    points: np.ndarray,
    scores: np.ndarray,
    pos_ratio_thresh: float = 0.8,
    mu_thresh: float = 0.55,
    chunk: int = 256,
) -> np.ndarray:
    """(P,3) points + (P,V,A,D) scores -> (P,V,A,D) tolerance labels."""
    p = len(points)
    v, a, d = scores.shape[1:]
    dists = np.linalg.norm(
        points[:, None, :].astype(np.float32) - points[None, :, :], axis=-1
    )
    scores_j = jnp.asarray(scores, jnp.float32)
    out = np.zeros((p, v * a * d), dtype=np.float32)
    for i in range(0, p, chunk):
        c = min(chunk, p - i)
        dc = np.zeros((chunk, p), np.float32)
        dc[:c] = dists[i : i + c]
        tol = np.asarray(
            _tolerance_chunk(
                jnp.asarray(dc),
                scores_j,
                pos_ratio_thresh=pos_ratio_thresh,
                mu_thresh=mu_thresh,
            )
        )
        out[i : i + c] = tol[:c]
    return out.reshape(p, v, a, d)


def tolerance_oracle(
    points: np.ndarray,
    scores: np.ndarray,
    pos_ratio_thresh: float = 0.8,
    mu_thresh: float = 0.55,
) -> np.ndarray:
    """Direct numpy transcription of the reference worker (:81-95), for tests."""
    p = len(points)
    v, a, d = scores.shape[1:]
    dists = np.linalg.norm(points[:, None] - points[None], axis=-1)
    out = np.zeros((p, v, a, d), dtype=np.float32)
    for i in range(p):
        tmp = np.zeros((v, a, d), dtype=np.float32)
        for r in RADIUS_LIST:
            in_ball = scores[dists[i] <= r]
            pos_ratio = ((in_ball > 0) & (in_ball <= mu_thresh)).mean(axis=0)
            mask = pos_ratio >= pos_ratio_thresh
            if mask.sum() == 0:
                break
            tmp[mask] = r
        out[i] = tmp
    return out
