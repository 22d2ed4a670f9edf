"""Furthest point sampling and index gathering.

Replaces the CUDA kernels in reference pointnet2/_ext_src/src/sampling_gpu.cu
with a sequential-scan JAX implementation (the algorithm is inherently
sequential in the sample index).  Matching semantics:

  * the first selected index is always 0 (sampling_gpu.cu:90-91);
  * points with squared norm <= 1e-3 are skipped entirely — they never update
    the running min-distance buffer and are never selected
    (sampling_gpu.cu:105-106);
  * the running min-distance buffer starts at 1e10 (sampling.cpp:79);
  * ties in the max-of-min-distance reduction resolve to the lowest index
    (first occurrence; the CUDA tree reduction replaces only on strictly
    greater values).

The op is non-differentiable (reference pointnet2_utils.py:73-75) — indices
are integers, so JAX gives that for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NEAR_ORIGIN_SQ = 1e-3
_INIT_DIST = 1e10


@functools.partial(jax.jit, static_argnames=("npoint", "use_pallas"))
def furthest_point_sample(xyz: jax.Array, npoint: int, use_pallas: bool | None = None) -> jax.Array:
    """Iterative furthest point sampling.

    Args:
      xyz: (B, N, 3) float32 point coordinates.
      npoint: number of samples to draw (npoint <= N).
      use_pallas: force the Pallas TPU kernel on/off; default auto-detects.

    Returns:
      (B, npoint) int32 indices into N.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from graspnet_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def _fps_single(xyz: jax.Array, npoint: int) -> jax.Array:
    n = xyz.shape[0]
    sq_norm = jnp.sum(xyz * xyz, axis=1)
    valid = sq_norm > _NEAR_ORIGIN_SQ

    def body(j, state):
        min_dist, idxs, last = state
        diff = xyz - xyz[last]
        d = jnp.sum(diff * diff, axis=1)
        new_min = jnp.where(valid, jnp.minimum(d, min_dist), min_dist)
        score = jnp.where(valid, new_min, -1.0)
        best = jnp.argmax(score).astype(jnp.int32)
        return new_min, idxs.at[j].set(best), best

    init = (
        jnp.full((n,), _INIT_DIST, dtype=jnp.float32),
        jnp.zeros((npoint,), dtype=jnp.int32),
        jnp.int32(0),
    )
    _, idxs, _ = lax.fori_loop(1, npoint, body, init)
    return idxs


@jax.custom_vjp
def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of a per-point array by index.

    Channels-last analogue of reference gather_points_kernel
    (sampling_gpu.cu:13-29): out[b, m, c] = points[b, idx[b, m], c].
    The scatter-add backward (sampling_gpu.cu:38-62) runs as one-hot MXU
    matmuls (ops/scatter.py) instead of XLA's near-serial TPU scatter.

    Args:
      points: (B, N, C).
      idx: (B, M) integer indices.

    Returns:
      (B, M, C).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def _gather_points_fwd(points, idx):
    return gather_points(points, idx), (idx, points.shape[1])


def _gather_points_bwd(res, g):
    from graspnet_tpu.ops.scatter import _int_zero, scatter_add_rows

    idx, n = res
    return scatter_add_rows(g, idx, n), _int_zero(idx)


gather_points.defvjp(_gather_points_fwd, _gather_points_bwd)
