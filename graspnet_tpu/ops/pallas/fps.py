"""Pallas TPU kernel for furthest point sampling.

FPS is the one op in the pipeline that is inherently sequential in the sample
index, so a fused kernel that keeps the point cloud and the running
min-distance vector resident in VMEM beats the XLA while-loop version (which
round-trips the min-distance buffer through HBM every step).

Semantics match reference sampling_gpu.cu:74-178 (see ops/sampling.py):
index 0 first, near-origin skip (‖p‖² <= 1e-3), min-dist init 1e10,
first-index tie-break.

Layout: the wrapper transposes (B, N, 3) to coordinate-planes (B, 3, Npad)
so the point axis lands on TPU lanes.  Scalar reads of the last-selected
point's coordinates are done with one-hot reductions (dynamic lane indexing
is not profitable on the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEAR_ORIGIN_SQ = 1e-3
_INIT_DIST = 1e10


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fps_kernel(n: int, npoint: int, xyz_ref, out_ref, mind_ref):
    # xyz_ref: (1, 8, npad) f32 (rows 0..2 = x,y,z); out_ref: (1, 1, npoint_pad) i32
    npad = xyz_ref.shape[-1]
    x = xyz_ref[0, 0:1, :]  # (1, npad)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    lane = lax.broadcasted_iota(jnp.int32, (1, npad), 1)
    in_range = lane < n
    mag = x * x + y * y + z * z
    valid = (mag > _NEAR_ORIGIN_SQ) & in_range

    mind_ref[:] = jnp.full((1, npad), _INIT_DIST, dtype=jnp.float32)
    out_ref[0, 0, :] = jnp.zeros((out_ref.shape[-1],), dtype=jnp.int32)

    def body(j, last):
        onehot = (lane == last).astype(jnp.float32)
        x1 = jnp.sum(x * onehot)
        y1 = jnp.sum(y * onehot)
        z1 = jnp.sum(z * onehot)
        dx = x - x1
        dy = y - y1
        dz = z - z1
        d = dx * dx + dy * dy + dz * dz
        new_min = jnp.where(valid, jnp.minimum(d, mind_ref[:]), mind_ref[:])
        mind_ref[:] = new_min
        score = jnp.where(valid, new_min, -1.0)
        best = jnp.argmax(score[0, :]).astype(jnp.int32)
        out_lane = lax.broadcasted_iota(jnp.int32, (1, out_ref.shape[-1]), 1)
        out_ref[0, 0, :] = jnp.where(out_lane[0, :] == j, best, out_ref[0, 0, :])
        return best

    lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """(B, N, 3) float32 -> (B, npoint) int32 FPS indices."""
    b, n, _ = xyz.shape
    npad = _round_up(n, 128)
    npoint_pad = _round_up(npoint, 128)
    planes = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    planes = jnp.pad(planes, ((0, 0), (0, 5), (0, npad - n)))  # (B, 8, npad)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, n, npoint),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (1, 1, npoint_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 1, npoint_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
    )(planes)
    return out[:, 0, :npoint]
