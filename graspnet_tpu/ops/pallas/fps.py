"""Pallas TPU kernels for furthest point sampling.

FPS is the one op in the pipeline that is inherently sequential in the sample
index, so a fused kernel that keeps the point cloud and the running
min-distance vector resident in VMEM beats the XLA while-loop version (which
round-trips the min-distance buffer through HBM every step).

Semantics match reference sampling_gpu.cu:74-178 (see ops/sampling.py):
index 0 first, near-origin skip (.|p|^2 <= 1e-3), min-dist init 1e10,
first-index tie-break.

Performance notes (the things that make this fast):
  * points live as 2-D (rows, 128) coordinate planes so every elementwise op
    uses all 8 VPU sublanes (a (1, N) layout wastes 7/8 of the vector unit);
  * the invalid/near-origin mask is folded into the running min-dist buffer
    as a -1 sentinel (squared distances are >= 0, so jnp.minimum can never
    resurrect an invalid lane) — no per-iteration where/select;
  * the argmax is two-level: a cheap sublane-axis max to one row, then a
    128-lane reduction; the winning index is recovered as the min of
    (index where dist == max) which preserves the first-occurrence tie-break;
  * selected indices are written with a dynamic single-row read-modify-write
    instead of a masked store over the whole output;
  * `fps_chain_pallas` runs the backbone's whole FPS cascade
    (N -> 2048 -> 1024 -> 512 -> 256) in ONE kernel launch: each selection
    also writes the chosen point's coordinates into the next stage's plane
    scratch, so the intermediate gathers never touch HBM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEAR_ORIGIN_SQ = 1e-3
_INIT_DIST = 1e10
_LANE = 128
_BIG_F32 = 3.0e7  # > any linear index (n_pad <= 2^24), exact in f32
_UNROLL = 1  # fori_loop unroll factor (see note at the loop site)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plane_pack(xyz: jax.Array) -> Tuple[jax.Array, int]:
    """(B, N, 3) -> (B, 3*R, 128) coordinate planes, zero padded.

    Zero padding makes padded lanes fail the |p|^2 > 1e-3 validity test, so
    no separate in-range mask is needed.
    """
    b, n, _ = xyz.shape
    r = -(-n // _LANE)
    planes = jnp.swapaxes(xyz.astype(jnp.float32), 1, 2)  # (B, 3, N)
    if r * _LANE != n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, r * _LANE - n)))
    return planes.reshape(b, 3 * r, _LANE), r


def _run_fps_stage(src_ref, r, npoint, out_ref, mind_ref, nxt_ref):
    """One FPS stage over the planes in src_ref rows [0:3r).

    src_ref: (1, >=3r, 128) f32 — x rows [0:r), y [r:2r), z [2r:3r).
    out_ref: (1, P, 128) i32 — selected indices, row j//128 lane j%128.
    mind_ref: (1, >=r, 128) f32 scratch — running min distance.
    nxt_ref: optional (1, 3*R', 128) f32 — coordinate planes of the selected
      points (the next chain stage's input), written at selection time.
    """
    lane = lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)

    x = src_ref[0, 0:r, :]
    y = src_ref[0, r : 2 * r, :]
    z = src_ref[0, 2 * r : 3 * r, :]
    mag = x * x + y * y + z * z
    valid = mag > _NEAR_ORIGIN_SQ
    # -1 sentinel on invalid lanes: d >= 0 so minimum() keeps them losing
    mind_ref[0, 0:r, :] = jnp.where(valid, _INIT_DIST, -1.0)

    # float32 linear indices: the recovery pass's select + min run ~40%
    # faster on the VPU in f32 than in i32 (measured on v5e), and indices
    # stay exact (n_pad <= 2^24 asserted by the callers)
    idx2d_f = (
        lax.broadcasted_iota(jnp.int32, (r, _LANE), 0) * _LANE
        + lax.broadcasted_iota(jnp.int32, (r, _LANE), 1)
    ).astype(jnp.float32)

    def select_coords(row, col):
        """Coordinates of global point index row*128+col (dynamic row read
        + 128-lane one-hot, instead of a full-cloud one-hot reduction)."""
        oh = (lane == col).astype(jnp.float32)
        bx = jnp.sum(src_ref[0, pl.ds(row, 1), :] * oh)
        by = jnp.sum(src_ref[0, pl.ds(r + row, 1), :] * oh)
        bz = jnp.sum(src_ref[0, pl.ds(2 * r + row, 1), :] * oh)
        return bx, by, bz

    def rowcol(j):
        return j // _LANE, j % _LANE

    def write_index(j, best):
        orow, ocol = rowcol(j)
        cur = out_ref[0, pl.ds(orow, 1), :]
        out_ref[0, pl.ds(orow, 1), :] = jnp.where(lane == ocol, best, cur)

    def write_next(j, bx, by, bz):
        if nxt_ref is None:
            return
        r2 = nxt_ref.shape[1] // 3
        nrow, ncol = rowcol(j)
        m = lane == ncol
        for off, v in ((0, bx), (r2, by), (2 * r2, bz)):
            cur = nxt_ref[0, pl.ds(off + nrow, 1), :]
            nxt_ref[0, pl.ds(off + nrow, 1), :] = jnp.where(m, v, cur)

    # j = 0: index 0 unconditionally (sampling_gpu.cu:90-91)
    write_index(0, jnp.int32(0))
    x0, y0, z0 = x[0, 0], y[0, 0], z[0, 0]
    write_next(0, x0, y0, z0)

    def body(j, carry):
        x1, y1, z1 = carry
        dx = x - x1
        dy = y - y1
        dz = z - z1
        d = dx * dx + dy * dy + dz * dz
        new_min = jnp.minimum(d, mind_ref[0, 0:r, :])
        mind_ref[0, 0:r, :] = new_min
        # two-level max, then first-occurrence index recovery (in f32)
        m = jnp.max(new_min)
        best = jnp.min(jnp.where(new_min == m, idx2d_f, _BIG_F32)).astype(
            jnp.int32
        )
        write_index(j, best)
        bx, by, bz = select_coords(*rowcol(best))
        write_next(j, bx, by, bz)
        return bx, by, bz

    # unroll=1 lowers fori_loop via scan instead of while_loop (no serial
    # trip-condition re-check per step); measured equal-or-faster for the
    # 20k->2048->1024->512->256 chain on a congested v5e. Mosaic supports
    # only unroll=1 or full unroll here.
    lax.fori_loop(1, npoint, body, (x0, y0, z0), unroll=_UNROLL)


def _fps_kernel(r: int, npoint: int, xyz_ref, out_ref, mind_ref):
    _run_fps_stage(xyz_ref, r, npoint, out_ref, mind_ref, None)


@functools.partial(jax.jit, static_argnames=("npoint",))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """(B, N, 3) float32 -> (B, npoint) int32 FPS indices."""
    b, n, _ = xyz.shape
    assert n <= 2**24, f"f32 index recovery requires n <= 2^24, got {n}"
    planes, r = _plane_pack(xyz)
    p = -(-npoint // _LANE)

    out = pl.pallas_call(
        functools.partial(_fps_kernel, r, npoint),
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(
                (1, 3 * r, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, p, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, p, _LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, r, _LANE), jnp.float32)],
    )(planes)
    return out.reshape(b, p * _LANE)[:, :npoint]


def _fps_chain_kernel(
    r0: int,
    npoints: Tuple[int, ...],
    xyz_ref,
    *refs,
):
    nstage = len(npoints)
    outs = refs[:nstage]
    mind_ref = refs[nstage]
    planes = refs[nstage + 1 :]  # per-stage coordinate scratches (stages 2..)

    src = xyz_ref
    r = r0
    for s, npoint in enumerate(npoints):
        nxt = planes[s] if s + 1 < nstage else None
        if nxt is not None:
            # zero-init so unwritten lanes read as near-origin (invalid)
            nxt[0, :, :] = jnp.zeros(nxt.shape[1:], jnp.float32)
        _run_fps_stage(src, r, npoint, outs[s], mind_ref, nxt)
        src = nxt
        r = npoint // _LANE


@functools.partial(jax.jit, static_argnames=("npoints",))
def fps_chain_pallas(
    xyz: jax.Array, npoints: Tuple[int, ...]
) -> Tuple[jax.Array, ...]:
    """Cascaded FPS in one kernel launch.

    Stage k runs FPS(n_{k-1} -> npoints[k]) where stage 0 samples the input
    cloud and stage k>0 samples the points selected by stage k-1 (the
    backbone's SA cascade, reference backbone.py:105-121).  The selected
    coordinates are forwarded between stages inside VMEM, so the intermediate
    gather_points round-trips disappear.

    Every npoints[k] for k >= 1 stage input must be a multiple of 128
    (true for the 2048/1024/512/256 backbone cascade).

    Returns one (B, npoints[k]) int32 index array per stage; stage k indices
    index into stage k-1's point list (stage 0 into the input cloud).
    """
    b, n, _ = xyz.shape
    assert n <= 2**24, f"f32 index recovery requires n <= 2^24, got {n}"
    planes, r0 = _plane_pack(xyz)
    for k in range(len(npoints) - 1):
        assert npoints[k] % _LANE == 0, (
            f"chain stage {k} output {npoints[k]} must be a multiple of 128"
        )

    out_shapes = []
    out_specs = []
    for npoint in npoints:
        p = -(-npoint // _LANE)
        out_shapes.append(jax.ShapeDtypeStruct((b, p, _LANE), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, p, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        )
    scratch = [pltpu.VMEM((1, r0, _LANE), jnp.float32)]
    for npoint in npoints[:-1]:
        scratch.append(
            pltpu.VMEM((1, 3 * (npoint // _LANE), _LANE), jnp.float32)
        )

    outs = pl.pallas_call(
        functools.partial(_fps_chain_kernel, r0, tuple(npoints)),
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(
                (1, 3 * r0, _LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(planes)
    return tuple(
        o.reshape(b, -1)[:, :npoint] for o, npoint in zip(outs, npoints)
    )
