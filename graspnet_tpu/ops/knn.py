"""k-nearest-neighbor ops: general kNN, 3-NN, and 3-point interpolation.

Replaces the reference's two separate native implementations:
  * knn/src/cuda/knn.cu — tiled pairwise-distance + per-column insertion sort
    (stable ascending; the 1-based index quirk at knn.cu:128,147,171 is NOT
    reproduced — this library is 0-based, callers in the reference always
    subtracted 1 anyway, utils/label_generation.py:60,86);
  * pointnet2/_ext_src/src/interpolate_gpu.cu — brute-force running min-3
    (three_nn_kernel:14-73) and weighted 3-feature sum (:77-113).

Both reduce to a distance matrix plus a stable top-k, which XLA maps onto the
MXU/VPU directly; ties resolve to the lowest index (first occurrence), same as
the strictly-less running-min comparisons in the CUDA code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _pairwise_d2(query: jax.Array, ref: jax.Array) -> jax.Array:
    """Exact squared distances (nq, nr) with the CUDA kernels' diff-square-sum order."""
    diff = query[:, None, :] - ref[None, :, :]
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(jax.jit, static_argnames=("k",))
def knn(ref: jax.Array, query: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest reference points for each query point.

    Args:
      ref: (B, Nr, 3) reference points.
      query: (B, Nq, 3) query points.
      k: neighbor count.

    Returns:
      (B, Nq, k) int32 indices into Nr, ascending by distance (0-based).
    """

    def per_scene(r, q):
        d2 = _pairwise_d2(q, r)
        if k <= 4:
            return _iter_min_k(d2, k)[1]
        _, idx = lax.top_k(-d2, k)
        return idx.astype(jnp.int32)

    return jax.vmap(per_scene)(ref, query)


def _iter_min_k(d2: jax.Array, k: int):
    """k smallest per row by k argmin passes (k small).

    lax.top_k lowers to a full sort over the row on TPU; for k<=4 masking
    out the winner and re-reducing is ~10x cheaper.  First-occurrence argmin
    reproduces the CUDA running-min tie order (earliest index wins, equal
    distances ordered by index).
    """
    m = d2.shape[-1]
    col = lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    dists, idxs = [], []
    for _ in range(k):
        i = jnp.argmin(d2, axis=-1)
        d = jnp.take_along_axis(d2, i[..., None], axis=-1)[..., 0]
        dists.append(d)
        idxs.append(i.astype(jnp.int32))
        d2 = jnp.where(col == i[..., None], jnp.inf, d2)
    return jnp.stack(dists, axis=-1), jnp.stack(idxs, axis=-1)


@jax.jit
def three_nn(unknown: jax.Array, known: jax.Array):
    """Three nearest `known` points for each `unknown` point.

    Matches three_nn_kernel semantics (interpolate_gpu.cu:14-56) with the
    torch wrapper's sqrt applied (pointnet2_utils.py:138-140).

    Args:
      unknown: (B, n, 3).
      known: (B, m, 3).

    Returns:
      dist: (B, n, 3) float32 Euclidean distances (sqrt of d²).
      idx: (B, n, 3) int32 indices into m.
    """

    def per_scene(u, kpts):
        d2 = _pairwise_d2(u, kpts)
        dist2, idx = _iter_min_k(d2, 3)
        return jnp.sqrt(dist2), idx

    return jax.vmap(per_scene)(unknown, known)


@jax.custom_vjp
def three_interpolate(features: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted sum of 3 neighbor feature rows.

    Channels-last analogue of three_interpolate_kernel
    (interpolate_gpu.cu:77-113); the feature backward (atomicAdd scatter,
    :122-159) runs as one-hot MXU matmuls (ops/scatter.py) instead of
    XLA's near-serial TPU scatter.

    Args:
      features: (B, m, C) source features.
      idx: (B, n, 3) neighbor indices into m.
      weight: (B, n, 3) interpolation weights.

    Returns:
      (B, n, C).
    """
    b, n, _ = idx.shape
    gathered = jnp.take_along_axis(
        features, idx.reshape(b, n * 3, 1), axis=1
    ).reshape(b, n, 3, features.shape[-1])
    return jnp.sum(gathered * weight[..., None], axis=2)


def _three_interpolate_fwd(features, idx, weight):
    return three_interpolate(features, idx, weight), (features, idx, weight)


def _three_interpolate_bwd(res, g):
    from graspnet_tpu.ops.scatter import _int_zero, scatter_add_rows

    features, idx, weight = res
    b, n, _ = idx.shape
    m = features.shape[1]
    c = features.shape[-1]
    # d_features[b, j, c] = sum_{(i,k): idx=j} weight[b,i,k] * g[b,i,c]
    wg = weight[..., None] * g[:, :, None, :]  # (B, n, 3, C)
    d_feat = scatter_add_rows(wg.reshape(b, n * 3, c), idx.reshape(b, n * 3), m)
    # d_weight[b, i, k] = <features[b, idx[b,i,k]], g[b, i]>
    gathered = jnp.take_along_axis(
        features, idx.reshape(b, n * 3, 1), axis=1
    ).reshape(b, n, 3, c)
    d_weight = jnp.sum(gathered * g[:, :, None, :], axis=-1)
    return d_feat, _int_zero(idx), d_weight


three_interpolate.defvjp(_three_interpolate_fwd, _three_interpolate_bwd)
