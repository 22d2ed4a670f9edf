"""MXU scatter-add: index-grouped gradient accumulation as one-hot matmuls.

XLA lowers the scatter-add backward of a gather (reference atomicAdd
backwards: sampling_gpu.cu:38-62, group_points_gpu.cu:45-71,
interpolate_gpu.cu:122-159) to a near-serial TPU scatter — ~2M scattered
elements cost ~20 ms, dominating the whole train step.  The same reduction
is a dense matmul against a one-hot indicator:

    out[b, j, c] = sum_k [idx[b, k] == j] * g[b, k, c]
                 = (onehot[b, j, :] @ g[b, :, :])[c]

which the MXU does in microseconds.  The indicator never materializes at
full size: the K axis is processed in chunks sized to bound the one-hot
block, accumulated with a lax.scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def scatter_add_rows(g: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """Sum rows of `g` into `n` output rows grouped by `idx`.

    Args:
      g: (B, K, C) values (gradients of a row gather).
      idx: (B, K) int32 target row per value; out-of-range rows are dropped.
      n: number of output rows.

    Returns:
      (B, n, C) with out[b, j] = sum over {k : idx[b, k] == j} of g[b, k].
    """
    b, k, c = g.shape
    # chunk K so the (B, n, chunk) one-hot block stays ~<=32 MB
    chunk = max(128, min(_round_up(k, 128), (8 * 2**20) // max(n, 1) // 128 * 128))
    kp = _round_up(k, chunk)
    if kp != k:
        g = jnp.pad(g, ((0, 0), (0, kp - k), (0, 0)))
        idx = jnp.pad(idx, ((0, 0), (0, kp - k)), constant_values=n)  # no match
    rows = jnp.arange(n, dtype=idx.dtype)

    def onehot_matmul(ich, gch):
        oh = (ich[:, None, :] == rows[None, :, None]).astype(g.dtype)  # (B,n,ch)
        return lax.dot_general(
            oh, gch,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=g.dtype,
        )  # (B, n, C)

    nch = kp // chunk
    if nch == 1:
        return onehot_matmul(idx, g)
    gs = jnp.moveaxis(g.reshape(b, nch, chunk, c), 1, 0)
    is_ = jnp.moveaxis(idx.reshape(b, nch, chunk), 1, 0)

    def body(acc, args):
        ich, gch = args
        return acc + onehot_matmul(ich, gch), None

    out, _ = lax.scan(body, jnp.zeros((b, n, c), g.dtype), (is_, gs))
    return out


def _int_zero(x):
    """Cotangent for an integer-dtype primal argument."""
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)
