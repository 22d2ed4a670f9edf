"""Radius (ball) and oriented-cylinder neighborhood queries, plus grouping.

Replaces reference pointnet2/_ext_src/src/ball_query_gpu.cu and
cylinder_query_gpu.cu.  The CUDA kernels scan points in index order and keep
the first `nsample` hits; empty slots are pre-filled with the FIRST hit
(ball_query_gpu.cu:39-44), and rows with zero hits stay all-zero because the
output buffer is zero-initialized (ball_query.cpp:25).  Those semantics are
order-dependent, so we reproduce them exactly with a masked smallest-index
top-k instead of a sequential scan:

    key[j, k]  = k            if point k is inside the region of center j
               = N            otherwise
    idx[j, :]  = the nsample smallest keys (ascending == index order)
    pad slots (key == N) -> first hit;  all-empty rows -> 0.

`lax.top_k` is stable, so ties (impossible here: keys are distinct ints)
and ordering match the scan.  Centers are processed in chunks via lax.map to
bound the (chunk, N) working set; distances use the same explicit
diff-square-sum expression as the CUDA kernels for bit parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _chunked_map(fn, xs, chunk: int):
    """lax.map over leading axis in chunks (static shapes; m % chunk == 0 required)."""
    m = xs.shape[0]
    if m <= chunk:
        return fn(xs)
    assert m % chunk == 0, f"center count {m} not divisible by chunk {chunk}"
    xs = xs.reshape(m // chunk, chunk, *xs.shape[1:])
    out = lax.map(fn, xs)
    return out.reshape(m, *out.shape[2:])


_LANE = 128


def _select_first_hits(mask: jax.Array, nsample: int) -> jax.Array:
    """First nsample True positions per row, index order, first-hit padding.

    mask: (..., n) bool. Returns (..., nsample) int32.

    Sort-free: a lane-tiled segmented prefix sum gives the running hit count
    r; the s-th hit is the first position with r >= s, located in two steps —
    count tile boundaries below s (picks the tile), then count in-tile prefix
    values below s (picks the lane).  O(n + nsample * n/128) per row instead
    of lax.top_k's sort, ~20x faster at (2048, 20000) on TPU.
    """
    lead = mask.shape[:-1]
    n = mask.shape[-1]
    m = 1
    for d in lead:
        m *= d
    mask2 = mask.reshape(m, n)
    npad = (n + _LANE - 1) // _LANE * _LANE
    if npad != n:
        mask2 = jnp.pad(mask2, ((0, 0), (0, npad - n)))
    g = npad // _LANE

    tiles = mask2.reshape(m, g, _LANE).astype(jnp.int32)
    local = jnp.cumsum(tiles, axis=-1)  # inclusive, within tile
    segtot = local[..., -1]  # (m, g)
    segend = jnp.cumsum(segtot, axis=-1)  # inclusive boundary count (m, g)
    segoff = segend - segtot  # exclusive prefix
    r = local + segoff[..., None]  # global running count (m, g, LANE)

    slots = jnp.arange(1, nsample + 1, dtype=jnp.int32)  # 1-based hit number
    # tile holding hit s: number of tiles whose end-count is still < s
    gstar = jnp.sum(
        (segend[:, None, :] < slots[None, :, None]).astype(jnp.int32), axis=-1
    )  # (m, nsample)
    gstar = jnp.minimum(gstar, g - 1)
    rseg = jnp.take_along_axis(r, gstar[..., None], axis=1)  # (m, nsample, LANE)
    p = jnp.sum((rseg < slots[None, :, None]).astype(jnp.int32), axis=-1)
    idx = gstar * _LANE + jnp.minimum(p, _LANE - 1)

    total = segend[:, -1:]  # (m, 1) hits per row
    first = idx[:, 0:1]
    idx = jnp.where(slots[None, :] <= total, idx, first)  # first-hit padding
    idx = jnp.where(total == 0, 0, idx)  # zero-hit rows stay 0
    return idx.astype(jnp.int32).reshape(*lead, nsample)


@functools.partial(
    jax.jit, static_argnames=("radius", "nsample", "chunk", "use_pallas")
)
def ball_query(
    xyz: jax.Array,
    new_xyz: jax.Array,
    radius: float,
    nsample: int,
    chunk: int = 512,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Indices of the first <=nsample points within `radius` of each center.

    Args:
      xyz: (B, N, 3) candidate points.
      new_xyz: (B, M, 3) query centers.
      use_pallas: force the Pallas TPU kernel on/off; default auto-detects.

    Returns:
      (B, M, nsample) int32 indices into N (first-hit padded).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from graspnet_tpu.ops.pallas.query import ball_query_pallas

        return ball_query_pallas(xyz, new_xyz, radius, nsample)
    r2 = radius * radius

    def per_scene(points, centers):
        def per_chunk(c):
            diff = c[:, None, :] - points[None, :, :]  # (chunk, N, 3)
            d2 = jnp.sum(diff * diff, axis=-1)
            return _select_first_hits(d2 < r2, nsample)

        return _chunked_map(per_chunk, centers, chunk)

    return jax.vmap(per_scene)(xyz, new_xyz)


@functools.partial(
    jax.jit, static_argnames=("radius", "hmin", "hmax", "nsample", "chunk")
)
def cylinder_query(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array,
    radius: float,
    hmin: float,
    hmax: float,
    nsample: int,
    chunk: int = 256,
) -> jax.Array:
    """Indices of points inside an oriented cylinder around each center.

    Mirrors query_cylinder_point_kernel (cylinder_query_gpu.cu:9-57): offsets
    are rotated into the gripper frame as offset @ R (row-vector convention;
    the kernel computes x_rot = r0*x + r3*y + r6*z etc., cylinder_query_gpu.cu:42-44),
    then kept if y²+z² < radius² and hmin < x < hmax.  First-hit padding as in
    ball_query.

    Args:
      xyz: (B, N, 3) candidate points.
      new_xyz: (B, M, 3) cylinder centers (seed points).
      rot: (B, M, 3, 3) rotation matrices, gripper frame -> world frame.

    Returns:
      (B, M, nsample) int32 indices.
    """
    r2 = radius * radius

    def per_scene(points, centers, rots):
        def per_chunk(args):
            c, R = args  # (chunk, 3), (chunk, 3, 3)
            diff = points[None, :, :] - c[:, None, :]  # (chunk, N, 3)
            x_r = (
                diff[..., 0] * R[:, None, 0, 0]
                + diff[..., 1] * R[:, None, 1, 0]
                + diff[..., 2] * R[:, None, 2, 0]
            )
            y_r = (
                diff[..., 0] * R[:, None, 0, 1]
                + diff[..., 1] * R[:, None, 1, 1]
                + diff[..., 2] * R[:, None, 2, 1]
            )
            z_r = (
                diff[..., 0] * R[:, None, 0, 2]
                + diff[..., 1] * R[:, None, 1, 2]
                + diff[..., 2] * R[:, None, 2, 2]
            )
            mask = (y_r * y_r + z_r * z_r < r2) & (x_r > hmin) & (x_r < hmax)
            return _select_first_hits(mask, nsample)

        m = centers.shape[0]
        if m <= chunk:
            return per_chunk((centers, rots))
        assert m % chunk == 0
        cs = centers.reshape(m // chunk, chunk, 3)
        rs = rots.reshape(m // chunk, chunk, 3, 3)
        out = lax.map(per_chunk, (cs, rs))
        return out.reshape(m, nsample)

    return jax.vmap(per_scene)(xyz, new_xyz, rot)


@jax.custom_vjp
def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather groups of point features by index.

    Channels-last analogue of group_points_kernel (group_points_gpu.cu:13-36):
    out[b, m, s, c] = points[b, idx[b, m, s], c].  The scatter-add backward
    (reference atomicAdd, group_points_gpu.cu:45-71) runs as one-hot MXU
    matmuls (ops/scatter.py) instead of XLA's near-serial TPU scatter.

    Args:
      points: (B, N, C).
      idx: (B, M, S) integer indices into N.

    Returns:
      (B, M, S, C).
    """
    b, m, s = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * s, 1), axis=1)
    return flat.reshape(b, m, s, points.shape[-1])


def _group_points_fwd(points, idx):
    return group_points(points, idx), (idx, points.shape[1])


def _group_points_bwd(res, g):
    from graspnet_tpu.ops.scatter import _int_zero, scatter_add_rows

    idx, n = res
    b, m, s = idx.shape
    d_points = scatter_add_rows(
        g.reshape(b, m * s, g.shape[-1]), idx.reshape(b, m * s), n
    )
    return d_points, _int_zero(idx)


group_points.defvjp(_group_points_fwd, _group_points_bwd)
