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


def _select_hits_core(mask: jax.Array, g: int, ns: int):
    """First-ns-hits selection on a (G, 128) VMEM-resident mask.

    Returns dict with: idx_col (NS,1) f32 final indices with first-hit/zero
    padding, onehot (G, NS), p_col (NS,1) in-tile lane positions,
    valid_col (NS,1) bool, total (1,1) f32.
    """
    lane_i = _fiota((_LANE, _LANE), 0)
    lane_j = _fiota((_LANE, _LANE), 1)
    ut = (lane_i <= lane_j).astype(jnp.float32)

    giota_gs = _fiota((g, ns), 0)
    slots_row = _fiota((1, ns), 1) + 1.0
    slots_col = _fiota((ns, 1), 0) + 1.0
    thresh = _fiota((ns, _LANE), 0) + 1.0

    # counting matmuls run in bf16 at 4x MXU rate and stay EXACT: operands
    # are 0/1 flags and per-tile counts <= 128 (bf16 represents integers to
    # 256 exactly), accumulation is f32 (exact integers far past N)
    local = jnp.dot(
        mask.astype(jnp.bfloat16),
        ut.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # (G,128) inclusive in-tile running count
    segtot = local[:, _LANE - 1 :]  # (G,1) hits per tile
    gi = _fiota((g, g), 0)
    gj = _fiota((g, g), 1)
    lt = (gj <= gi).astype(jnp.bfloat16)
    segend = jnp.dot(
        lt, segtot.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )  # (G,1)
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

    valid_col = slots_col <= total
    giota_col = _fiota((g, 1), 0)
    gstar_col = jax.lax.dot_general(
        onehot, giota_col,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    idx_col = gstar_col * float(_LANE) + p_col
    first = idx_col[0:1, 0:1]
    idx_col = jnp.where(valid_col, idx_col, first)
    idx_col = jnp.where(total > 0.0, idx_col, 0.0)
    return {
        "onehot": onehot,
        "p_col": p_col,
        "valid_col": valid_col,
        "total": total,
        "idx_col": idx_col,
    }


def _program_select(masks, g: int, ns: int):
    """Lane-oriented first-ns-hits selection for ALL masks of one program.

    The per-selection variant (_select_hits_core) pads badly on the MXU:
    M=ns rows pad to 128 and each selection re-dispatches its own prefix
    matmul.  Here the K = len(masks) selections share:

      * ONE (K*g, 128) x (128, 128) bf16 in-tile prefix-sum matmul;
      * per-selection (g, g) VPU broadcast-reductions for the tile-total
        prefix (columns in, rows out — Mosaic has no cross-lane transpose,
        so both quantities are derived in the orientation they are used);
      * per-selection (ns, g) @ (g, 128) bf16 gathers of the LOCAL count
        rows (values <= 128: exact in bf16) for the in-tile positions.

    All arithmetic stays exact, so selected indices are bit-identical to
    the sequential scan.

    Returns dict of per-selection lists:
      t_hot: (ns, g) f32 winning-tile one-hot (TRANSPOSED: slot rows, tile
        lanes) — `t_hot @ plane` gathers the winning tile's row;
      p_col: (ns, 1) f32 in-tile lane position;
      gstar_col: (ns, 1) f32 winning tile;
      valid: (ns, 1) bool slot-has-real-hit;
      total: (1, 1) f32 hits in the selection.
    """
    nsel = len(masks)
    lane_i = _fiota((_LANE, _LANE), 0)
    lane_j = _fiota((_LANE, _LANE), 1)
    ut = (lane_i <= lane_j).astype(jnp.bfloat16)
    mask_all = jnp.concatenate(masks, axis=0)  # (nsel*g, 128)
    local_all = jnp.dot(
        mask_all.astype(jnp.bfloat16), ut, preferred_element_type=jnp.float32
    )  # counts <= 128: exact
    segtot_all = local_all[:, _LANE - 1 :]  # (nsel*g, 1)

    gi = _fiota((g, g), 0)
    gj = _fiota((g, g), 1)
    incl = (gi <= gj).astype(jnp.float32)  # [t', t] : t' <= t
    diag = (gi == gj).astype(jnp.float32)
    slots_col = _fiota((ns, 1), 0) + 1.0
    lane_g = _fiota((ns, g), 1)

    out = {"t_hot": [], "p_col": [], "gstar_col": [], "valid": [], "total": []}
    for k in range(nsel):
        st_col = segtot_all[k * g : (k + 1) * g, :]  # (g, 1)
        se_row = jnp.sum(incl * st_col, axis=0, keepdims=True)  # (1, g) incl.
        segstart_row = se_row - jnp.sum(diag * st_col, axis=0, keepdims=True)
        gstar_col = jnp.sum(
            (se_row < slots_col).astype(jnp.float32), axis=1, keepdims=True
        )  # (ns, 1) winning tile per slot
        gstar_col = jnp.minimum(gstar_col, float(g - 1))
        t_hot = (lane_g == gstar_col).astype(jnp.float32)  # (ns, g)
        segstart_col = jnp.sum(t_hot * segstart_row, axis=1, keepdims=True)
        rows_local = jnp.dot(
            t_hot.astype(jnp.bfloat16),
            local_all[k * g : (k + 1) * g, :].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )  # (ns, 128) exact
        p_col = jnp.sum(
            (rows_local < (slots_col - segstart_col)).astype(jnp.float32),
            axis=1,
            keepdims=True,
        )
        total = se_row[0:1, g - 1 : g]
        out["t_hot"].append(t_hot)
        out["p_col"].append(jnp.minimum(p_col, float(_LANE - 1)))
        out["gstar_col"].append(gstar_col)
        out["valid"].append(slots_col <= total)
        out["total"].append(total)
    return out


def _select_first_hits_vmem(mask: jax.Array, g: int, ns: int):
    """First-ns-hits selection on a (G, 128) VMEM-resident mask.

    Returns (idx_col (NS,1) f32 final indices with first-hit/zero padding,
    onehot (G, NS) tile-selector for row gathers, p_col (NS,1) in-tile lane
    positions, valid_col (NS,1) bool slot-has-real-hit, total (1,1) f32).
    """
    r = _select_hits_core(mask, g, ns)
    return r["idx_col"], r["onehot"], r["p_col"], r["valid_col"], r["total"]


def _select_idx_batched(masks, g: int, ns: int) -> jax.Array:
    """First-ns-hits indices for K independent selections in ONE matmul set.

    Small per-tile point counts (g <= ~32) make the per-selection matmuls of
    _select_hits_core badly shaped for the MXU (M=g rows of 128).  Stacking K
    masks along rows turns them into full-size products:

      * one (K*g, 128) x (128, 128) bf16 in-tile prefix-sum,
      * one block-diagonal (K*g, K*g) bf16 tile-total prefix-sum,
      * one block-structured (K*g, K*ns)^T x (K*g, 128) f32 row gather.

    Everything is built from 2-D iota comparisons — Mosaic supports no
    cross-lane reshapes, so row- and column-oriented forms of each quantity
    are derived independently rather than transposed.

    Args:
      masks: list of K (g, 128) hit masks (0/1 float32).
      g, ns: tiles per selection / slots per selection.

    Returns:
      (K*ns, 1) f32 selected indices in selection-major slot order; empty
      slots hold -1 (callers apply the reference first-hit/zero padding —
      cheap in XLA, where it is just two wheres over the final array).
    """
    k = len(masks)
    kg = k * g
    kn = k * ns
    lane_i = _fiota((_LANE, _LANE), 0)
    lane_j = _fiota((_LANE, _LANE), 1)
    ut = (lane_i <= lane_j).astype(jnp.bfloat16)

    mask_all = jnp.concatenate(masks, axis=0)  # (K*g, 128)
    local = jnp.dot(
        mask_all.astype(jnp.bfloat16), ut, preferred_element_type=jnp.float32
    )  # (K*g, 128) in-tile inclusive running count — exact (counts <= 128)
    segtot = local[:, _LANE - 1 :]  # (K*g, 1)

    gi = jax.lax.broadcasted_iota(jnp.int32, (kg, kg), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (kg, kg), 1)
    same_sel = gi // g == gj // g
    lt = ((gj <= gi) & same_sel).astype(jnp.bfloat16)
    segend = jnp.dot(
        lt, segtot.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )  # (K*g, 1) per-selection inclusive tile-total prefix — exact
    # row-oriented copy (no transposes on TPU): segend_row[0, c] =
    # sum_r [same sel, r%g <= c%g] segtot[r]
    segend_row = jnp.sum(
        jnp.where((gi % g <= gj % g) & same_sel, segtot, 0.0),
        axis=0,
        keepdims=True,
    )  # (1, K*g)

    # winning tile per slot, in both orientations
    r_sel = jax.lax.broadcasted_iota(jnp.int32, (kn, kg), 0) // ns
    c_sel = jax.lax.broadcasted_iota(jnp.int32, (kn, kg), 1) // g
    slot_col = _fiota((kn, 1), 0) % float(ns) + 1.0  # 1..ns per selection
    gstar_col = jnp.sum(
        ((r_sel == c_sel) & (segend_row < slot_col)).astype(jnp.float32),
        axis=1,
        keepdims=True,
    )  # (K*ns, 1)
    gstar_col = jnp.minimum(gstar_col, float(g - 1))

    t_sel = jax.lax.broadcasted_iota(jnp.int32, (kg, kn), 0) // g
    s_sel = jax.lax.broadcasted_iota(jnp.int32, (kg, kn), 1) // ns
    slot_row = _fiota((1, kn), 1) % float(ns) + 1.0
    gstar_row = jnp.sum(
        ((t_sel == s_sel) & (segend < slot_row)).astype(jnp.float32),
        axis=0,
        keepdims=True,
    )  # (1, K*ns)
    gstar_row = jnp.minimum(gstar_row, float(g - 1))

    # block one-hot (K*g, K*ns): col s picks its selection's tile gstar[s]
    tile_idx = _fiota((kg, kn), 0) % float(g)
    onehot = ((t_sel == s_sel) & (tile_idx == gstar_row)).astype(jnp.float32)

    r_global = local + (segend - segtot)  # (K*g, 128)
    rseg = jax.lax.dot_general(
        onehot, r_global,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K*ns, 128)
    p_col = jnp.sum((rseg < slot_col).astype(jnp.float32), axis=1, keepdims=True)
    p_col = jnp.minimum(p_col, float(_LANE - 1))
    idx = gstar_col * float(_LANE) + p_col  # (K*ns, 1)

    # -1 marks empty slots; total hits per selection gathered row-wise
    last_tile = jax.lax.broadcasted_iota(jnp.int32, (kn, kg), 1) == (
        r_sel * g + (g - 1)
    )
    total_col = jnp.sum(
        jnp.where(last_tile, segend_row, 0.0), axis=1, keepdims=True
    )  # (K*ns, 1)
    return jnp.where(slot_col <= total_col, idx, -1.0)


def _apply_first_hit_padding(idx: jax.Array) -> jax.Array:
    """Reference padding semantics over (-1)-marked empty slots: empty slots
    take the selection's first hit; selections with zero hits take 0
    (ball_query_gpu.cu:39-44).  idx: (..., ns) float/int with -1 markers."""
    first = idx[..., 0:1]
    return jnp.where(idx < 0, jnp.where(first < 0, jnp.zeros_like(idx), first), idx)


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

    NOTE: this is the simple per-(scene, seed) grid variant, kept as the
    cross-validation oracle for multi_query_batched_pallas (which all
    production callers use — ops.ball_query, heads.cylinder_query_multi_
    depth); tests pin the two bit-equal so the semantics cannot drift.

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


def _query_batched_kernel(
    seed_ref,  # SMEM (1, SB, 1, 3)
    rot_ref,  # SMEM (1, SB, 1, 9)
    pts_ref,  # VMEM (1, 3*G, 128)
    out_ref,  # VMEM (1, SB*D*NS, 1) float32 indices (-1 = empty slot)
    *,
    g: int,
    ns: int,
    ndepth: int,
    r2: float,
    hmin: float,
    hmaxs: Tuple[float, ...],
    rotate: bool,
    sb: int,
    use_program_select: bool,
):
    masks = []
    for s in range(sb):
        cx = seed_ref[0, s, 0, 0]
        cy = seed_ref[0, s, 0, 1]
        cz = seed_ref[0, s, 0, 2]
        dx = pts_ref[0, 0:g, :] - cx
        dy = pts_ref[0, g : 2 * g, :] - cy
        dz = pts_ref[0, 2 * g : 3 * g, :] - cz
        if rotate:
            x_r = dx * rot_ref[0, s, 0, 0] + dy * rot_ref[0, s, 0, 3] + dz * rot_ref[0, s, 0, 6]
            y_r = dx * rot_ref[0, s, 0, 1] + dy * rot_ref[0, s, 0, 4] + dz * rot_ref[0, s, 0, 7]
            z_r = dx * rot_ref[0, s, 0, 2] + dy * rot_ref[0, s, 0, 5] + dz * rot_ref[0, s, 0, 8]
            yz2 = y_r * y_r + z_r * z_r
            for d in range(ndepth):
                masks.append(
                    ((yz2 < r2) & (x_r > hmin) & (x_r < hmaxs[d])).astype(jnp.float32)
                )
        else:
            d2 = dx * dx + dy * dy + dz * dz
            masks.append((d2 < r2).astype(jnp.float32))

    if use_program_select:
        # large-g path: lane-oriented program-wide selection
        sel = _program_select(masks, g, ns)
        # selection-major (ns, 1) index columns; -1 marks empty slots (the
        # reference first-hit/zero padding is two cheap wheres in XLA)
        cols = []
        for k in range(len(masks)):
            idx = sel["gstar_col"][k] * float(_LANE) + sel["p_col"][k]
            cols.append(jnp.where(sel["valid"][k], idx, -1.0))
        out_ref[0, :, :] = jnp.concatenate(cols, axis=0)  # (SB*D*NS, 1)
    else:
        # small-g path: cross-selection block-diagonal stacking fills the
        # MXU where per-selection (g, 128) operands cannot
        out_ref[0, :, :] = _select_idx_batched(masks, g, ns)


@functools.partial(
    jax.jit,
    static_argnames=("radius", "hmin", "hmax_list", "nsample", "rotate"),
)
def multi_query_batched_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array | None,
    radius: float,
    hmin: float,
    hmax_list: Tuple[float, ...],
    nsample: int,
    rotate: bool = True,
) -> jax.Array:
    """Seed-batched variant of multi_query_pallas.

    Groups seeds so each program stacks K = sb * D selections into the
    full-width matmuls of _select_idx_batched — the per-seed variant's
    (g, 128) products underfill the MXU badly when g is small (sa2-4 query
    over 2048/1024/512 points).

    Returns (B, M, D, nsample) int32 indices.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ndepth = len(hmax_list)
    g = -(-n // _LANE)

    # small g: block-diagonal stacking, ~2-4 lane tiles tall; large g:
    # program-wide selection, bounded by the VMEM mask/count buffers
    use_program_select = g > 32
    sb = 1
    if use_program_select:
        for cand in (16, 8, 4, 2):
            if m % cand == 0 and cand * ndepth * g <= 4096:
                sb = cand
                break
    else:
        for cand in (32, 16, 8, 4, 2):
            if m % cand == 0 and cand * ndepth * g <= 512:
                sb = cand
                break

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
        _query_batched_kernel,
        g=g, ns=nsample, ndepth=ndepth, r2=radius * radius,
        hmin=hmin, hmaxs=tuple(hmax_list), rotate=rotate, sb=sb,
        use_program_select=use_program_select,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, m // sb),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(
                (1, sb, 1, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, sb, 1, 9), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 3 * g, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, sb * ndepth * nsample, 1),
            lambda i, j: (i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m * ndepth * nsample, 1), jnp.float32),
    )(new_xyz[:, :, None, :], rot_flat[:, :, None, :], planes)
    out = out.reshape(b, m, ndepth, nsample)
    return _apply_first_hit_padding(out).astype(jnp.int32)


def cylinder_query_multi_pallas(
    xyz, new_xyz, rot, radius, hmin, hmax_list, nsample
) -> jax.Array:
    """(B, M, D, nsample) — drop-in for heads.cylinder_query_multi_depth."""
    return multi_query_batched_pallas(
        xyz, new_xyz, rot, radius, hmin, tuple(hmax_list), nsample, rotate=True
    )


def ball_query_pallas(xyz, new_xyz, radius, nsample) -> jax.Array:
    """(B, M, nsample) — drop-in for ops.ball_query."""
    out = multi_query_batched_pallas(
        xyz, new_xyz, None, radius, 0.0, (0.0,), nsample, rotate=False
    )
    return out[:, :, 0, :]
