"""Fused multi-depth cylinder / ball query as a Pallas TPU kernel.

Replaces the XLA path in graspnet_tpu.ops.query / models.heads for the hot
crop stage (reference cylinder_query_gpu.cu:9-67 semantics: first <=nsample
in-region point indices in scan order, first-hit padding, zero rows when
empty).  The XLA version materializes (M, N) rotated-coordinate, mask and
prefix-count tensors in HBM every frame (~9 ms at 1024 seeds x 20000 points
x 4 depths); here each (scene, seed) grid step keeps everything in VMEM:

  * the cloud is laid out as three (G, 128) coordinate planes (G = N/128
    tiles) with a constant index map, so it is DMA'd into VMEM once and
    reused by all M seed programs;
  * rotated coords x_r / y_r^2+z_r^2 are computed once per seed and shared
    by all D depth masks;
  * the "first nsample hits in index order" selection runs as two
    triangular matmuls on the MXU (in-tile inclusive prefix sum over lanes,
    tile-total prefix sum over tiles) plus small compare/reduce ops — the
    s-th hit lives in the first tile whose cumulative count reaches s, at
    in-tile position #{running count < s}.

All arithmetic is float32 (counts <= N < 2^24, exact) so parity with the
index-order scan is bitwise.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SENTINEL = 1.0e9  # padding coordinate: fails every radius test


def _fiota(shape, dim):
    """float32 iota via int32 (Mosaic rejects float tpu.iota)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _select_first_hits_vmem(mask: jax.Array, g: int, ns: int):
    """First-ns-hits selection on a (G, 128) VMEM-resident mask.

    Returns (idx_col (NS,1) f32 final indices with first-hit/zero padding,
    onehot (G, NS) tile-selector for row gathers, p_col (NS,1) in-tile lane
    positions, valid_col (NS,1) bool slot-has-real-hit, total (1,1) f32).
    """
    lane_i = _fiota((_LANE, _LANE), 0)
    lane_j = _fiota((_LANE, _LANE), 1)
    ut = (lane_i <= lane_j).astype(jnp.float32)

    giota_col = _fiota((g, 1), 0)
    giota_gs = _fiota((g, ns), 0)
    slots_row = _fiota((1, ns), 1) + 1.0
    slots_col = _fiota((ns, 1), 0) + 1.0
    thresh = _fiota((ns, _LANE), 0) + 1.0

    local = jnp.dot(mask, ut, preferred_element_type=jnp.float32)  # (G,128)
    segtot = local[:, _LANE - 1 :]  # (G,1) hits per tile
    gi = _fiota((g, g), 0)
    gj = _fiota((g, g), 1)
    lt = (gj <= gi).astype(jnp.float32)
    segend = jnp.dot(lt, segtot, preferred_element_type=jnp.float32)  # (G,1)
    r_global = local + (segend - segtot)  # inclusive global running count
    total = segend[g - 1 :, 0:1]  # (1,1)

    gstar_row = jnp.sum(
        (segend < slots_row).astype(jnp.float32), axis=0, keepdims=True
    )
    gstar_row = jnp.minimum(gstar_row, float(g - 1))
    onehot = (giota_gs == gstar_row).astype(jnp.float32)  # (G, NS)
    rseg = jax.lax.dot_general(
        onehot, r_global,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (NS, 128)
    p_col = jnp.sum((rseg < thresh).astype(jnp.float32), axis=1, keepdims=True)
    p_col = jnp.minimum(p_col, float(_LANE - 1))
    gstar_col = jax.lax.dot_general(
        onehot, giota_col,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    idx_col = gstar_col * float(_LANE) + p_col

    valid_col = slots_col <= total
    first = idx_col[0:1, 0:1]
    idx_col = jnp.where(valid_col, idx_col, first)
    idx_col = jnp.where(total > 0.0, idx_col, 0.0)
    return idx_col, onehot, p_col, valid_col, total


def _query_kernel(
    seed_ref,  # SMEM (1, 1, 1, 3)
    rot_ref,  # SMEM (1, 1, 1, 9) row-major 3x3
    pts_ref,  # VMEM (1, 3*G, 128): x-plane, y-plane, z-plane
    out_ref,  # VMEM (1, 1, NS, D) float32 indices
    *,
    g: int,
    ns: int,
    ndepth: int,
    r2: float,
    hmin: float,
    hmaxs: Tuple[float, ...],
    rotate: bool,
):
    cx = seed_ref[0, 0, 0, 0]
    cy = seed_ref[0, 0, 0, 1]
    cz = seed_ref[0, 0, 0, 2]

    dx = pts_ref[0, 0:g, :] - cx
    dy = pts_ref[0, g : 2 * g, :] - cy
    dz = pts_ref[0, 2 * g : 3 * g, :] - cz

    if rotate:
        # gripper-frame coords: offset @ R (column k of the row-major 3x3;
        # reference cylinder_query_gpu.cu:42-44)
        x_r = (
            dx * rot_ref[0, 0, 0, 0]
            + dy * rot_ref[0, 0, 0, 3]
            + dz * rot_ref[0, 0, 0, 6]
        )
        y_r = (
            dx * rot_ref[0, 0, 0, 1]
            + dy * rot_ref[0, 0, 0, 4]
            + dz * rot_ref[0, 0, 0, 7]
        )
        z_r = (
            dx * rot_ref[0, 0, 0, 2]
            + dy * rot_ref[0, 0, 0, 5]
            + dz * rot_ref[0, 0, 0, 8]
        )
        yz2 = y_r * y_r + z_r * z_r
    else:
        x_r = dx
        yz2 = dx * dx + dy * dy + dz * dz  # ball: full squared distance

    for d in range(ndepth):
        if rotate:
            mask = (
                (yz2 < r2) & (x_r > hmin) & (x_r < hmaxs[d])
            ).astype(jnp.float32)
        else:
            mask = (yz2 < r2).astype(jnp.float32)
        idx_col, _, _, _, _ = _select_first_hits_vmem(mask, g, ns)
        out_ref[0, 0, :, pl.ds(d, 1)] = idx_col


@functools.partial(
    jax.jit,
    static_argnames=("radius", "hmin", "hmax_list", "nsample", "rotate"),
)
def multi_query_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array | None,
    radius: float,
    hmin: float,
    hmax_list: Tuple[float, ...],
    nsample: int,
    rotate: bool = True,
) -> jax.Array:
    """Fused multi-depth cylinder query (rotate=True) or ball query
    (rotate=False, single depth).

    Args:
      xyz: (B, N, 3) points.
      new_xyz: (B, M, 3) centers.
      rot: (B, M, 3, 3) rotations (ignored when rotate=False).

    Returns:
      (B, M, D, nsample) int32 indices (D = len(hmax_list)).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ndepth = len(hmax_list)
    g = -(-n // _LANE)

    # (B, 3, G*128) coordinate planes, sentinel-padded
    planes = jnp.transpose(xyz, (0, 2, 1))
    if g * _LANE != n:
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, g * _LANE - n)),
            constant_values=_SENTINEL,
        )
    planes = planes.reshape(b, 3 * g, _LANE)

    if rot is None:
        rot_flat = jnp.zeros((b, m, 9), xyz.dtype)
    else:
        rot_flat = rot.reshape(b, m, 9)

    kernel = functools.partial(
        _query_kernel,
        g=g,
        ns=nsample,
        ndepth=ndepth,
        r2=radius * radius,
        hmin=hmin,
        hmaxs=tuple(hmax_list),
        rotate=rotate,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, m),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 3 * g, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, nsample, ndepth),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, nsample, ndepth), jnp.float32),
    )(new_xyz[:, :, None, :], rot_flat[:, :, None, :], planes)
    return jnp.transpose(out, (0, 1, 3, 2)).astype(jnp.int32)


def cylinder_query_multi_pallas(
    xyz, new_xyz, rot, radius, hmin, hmax_list, nsample
) -> jax.Array:
    """(B, M, D, nsample) — drop-in for heads.cylinder_query_multi_depth."""
    return multi_query_pallas(
        xyz, new_xyz, rot, radius, hmin, tuple(hmax_list), nsample, rotate=True
    )


def ball_query_pallas(xyz, new_xyz, radius, nsample) -> jax.Array:
    """(B, M, nsample) — drop-in for ops.ball_query."""
    out = multi_query_pallas(
        xyz, new_xyz, None, radius, 0.0, (0.0,), nsample, rotate=False
    )
    return out[:, :, 0, :]
