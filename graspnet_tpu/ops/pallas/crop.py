"""Fully-fused CloudCrop stage as one Pallas TPU kernel (inference path).

Reference CloudCrop (models/modules.py:95-141) = per seed x depth: cylinder
query -> group 64 points -> center-subtract + rotate into the gripper frame
-> SharedMLP [3,64,128,256] -> maxpool over samples.  The XLA pipeline
materializes the (B, Ns, D, S) index tensor and the (B, Ns, D, S, 3) grouped
offsets in HBM between those steps; here one kernel program per (scene, seed)
does everything in VMEM:

  * rotated offsets x_r/y_r/z_r over all N points are computed once and
    reused for all D depth masks AND as the gather source — the selected
    samples' gripper-frame coordinates are read straight out of them via the
    same tile-onehot matmul that locates the hit indices (no HBM gather);
  * batch-norm (eval mode) is pre-folded into the conv weights on the host,
    so the MLP is three back-to-back MXU matmuls + ReLU;
  * only the pooled (D, 256) feature block is written back per seed.

Selection indices are bit-identical to the unfused path; the MLP features
match to ULP-level tolerance (BN folding reassociates (x@W - mean) * s into
x @ (W*s) + b', mathematically equal but not bitwise in float32).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from graspnet_tpu.ops.pallas.query import (
    _LANE,
    _SENTINEL,
    _fiota,
    _program_select,
    _select_first_hits_vmem,
)


def fold_bn_eval(layers: List[Dict[str, Any]], eps: float):
    """Fold eval-mode BatchNorm into the dense weights.

    relu(bn(x @ W)) == relu(x @ (W * s) + (offset - mean * s)),
    s = scale / sqrt(var + eps).
    Returns [(W', b'), ...] with W' (in, out), b' (1, out).
    """
    folded = []
    for layer in layers:
        w = layer["kernel"]
        if "bn" in layer:
            bn = layer["bn"]
            s = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
            wf = w * s[None, :]
            bf = bn["offset"] - bn["mean"] * s
        else:
            wf = w
            bf = layer.get("bias", jnp.zeros((w.shape[1],), w.dtype))
        folded.append((wf, bf[None, :]))
    return folded


def _gather_grouped_core(
    seed_ref,
    rot_ref,
    pts_ref,
    *,
    g: int,
    ns: int,
    ndepth: int,
    r2: float,
    hmin: float,
    hmaxs: Tuple[float, ...],
    normalize: float,
    ball: bool,
    sb: int,
):
    """Query + first-hits gather + pad + gripper-frame transform for one
    program block: the shared front half of the fused crop kernels.

    All SB*D selections of the program are batched into full-width matmuls.
    Two structural facts make this ~2x the per-(seed,depth) version:

      * the gathered samples' coordinates come from the SHARED raw x/y/z
        planes — center-subtract and gripper-frame rotation commute with the
        gather (same float ops on the same values), so ONE (SB*D*NS, 384)
        one-hot product replaces SB*D separate M=64 (-> padded 128) gathers
        from per-seed rotated planes;
      * the in-tile slot position needs only the winning tile's LOCAL
        running-count row (values <= 128, exact in bf16) plus the tile's
        start count (computed per-slot on the VPU), so that gather runs at
        bf16 MXU rate instead of gathering the f32 global-count plane.

    Returns (sx, sy, sz), each (SB*D*NS, 1) f32: the selected samples'
    gripper-frame offsets in seed-major / depth / slot order, with the
    reference first-hit/zero padding already applied.
    """
    nsel = sb * ndepth
    x_pl = pts_ref[0, 0:g, :]
    y_pl = pts_ref[0, g : 2 * g, :]
    z_pl = pts_ref[0, 2 * g : 3 * g, :]

    masks = []  # nsel x (g, 128), seed-major / depth-minor
    for s in range(sb):
        cx = seed_ref[0, s, 0, 0]
        cy = seed_ref[0, s, 0, 1]
        cz = seed_ref[0, s, 0, 2]
        dx = x_pl - cx
        dy = y_pl - cy
        dz = z_pl - cz
        if ball:
            yz2 = dx * dx + dy * dy + dz * dz
            masks.append((yz2 < r2).astype(jnp.float32))
        else:
            x_r = dx * rot_ref[0, s, 0, 0] + dy * rot_ref[0, s, 0, 3] + dz * rot_ref[0, s, 0, 6]
            y_r = dx * rot_ref[0, s, 0, 1] + dy * rot_ref[0, s, 0, 4] + dz * rot_ref[0, s, 0, 7]
            z_r = dx * rot_ref[0, s, 0, 2] + dy * rot_ref[0, s, 0, 5] + dz * rot_ref[0, s, 0, 8]
            yz2 = y_r * y_r + z_r * z_r
            for d in range(ndepth):
                masks.append(
                    ((yz2 < r2) & (x_r > hmin) & (x_r < hmaxs[d])).astype(
                        jnp.float32
                    )
                )

    # program-wide first-ns-hits selection (shared helper; see
    # ops/pallas/query.py::_program_select for the batching structure)
    sel = _program_select(masks, g, ns)
    pcols, valids, totals = sel["p_col"], sel["valid"], sel["total"]

    # ONE full-width f32 gather for every selection's sample coordinates,
    # straight from the shared raw planes
    t_cat = jnp.concatenate(sel["t_hot"], axis=0)  # (nsel*ns, g)
    planes_cat = jnp.concatenate([x_pl, y_pl, z_pl], axis=1)  # (g, 384)
    rows_xyz = jnp.dot(
        t_cat, planes_cat, preferred_element_type=jnp.float32
    )  # (nsel*ns, 384)
    p_cat = jnp.concatenate(pcols, axis=0)  # (nsel*ns, 1)
    lhot = (_fiota((nsel * ns, _LANE), 1) == p_cat).astype(jnp.float32)
    raw_x = jnp.sum(rows_xyz[:, 0:_LANE] * lhot, axis=1, keepdims=True)
    raw_y = jnp.sum(rows_xyz[:, _LANE : 2 * _LANE] * lhot, axis=1, keepdims=True)
    raw_z = jnp.sum(rows_xyz[:, 2 * _LANE :] * lhot, axis=1, keepdims=True)

    # reference padding on the RAW values (the per-slot transform below is
    # elementwise, so padding before == padding after): empty slots -> first
    # hit of the selection; zero-hit selections -> point 0
    p0 = (x_pl[0:1, 0:1], y_pl[0:1, 0:1], z_pl[0:1, 0:1])
    cols_x, cols_y, cols_z = [], [], []
    for k in range(nsel):
        s = k // ndepth
        sl = slice(k * ns, (k + 1) * ns)
        vx, vy, vz = raw_x[sl], raw_y[sl], raw_z[sl]
        first = lambda v: v[0:1, 0:1]  # noqa: E731
        vx = jnp.where(totals[k] > 0.0, jnp.where(valids[k], vx, first(vx)), p0[0])
        vy = jnp.where(totals[k] > 0.0, jnp.where(valids[k], vy, first(vy)), p0[1])
        vz = jnp.where(totals[k] > 0.0, jnp.where(valids[k], vz, first(vz)), p0[2])
        # center-subtract (+ rotation into the gripper frame) AFTER the
        # gather: identical float ops on identical values as the reference's
        # transform-then-gather order
        dx = vx - seed_ref[0, s, 0, 0]
        dy = vy - seed_ref[0, s, 0, 1]
        dz = vz - seed_ref[0, s, 0, 2]
        if ball:
            cols_x.append(dx)
            cols_y.append(dy)
            cols_z.append(dz)
        else:
            cols_x.append(
                dx * rot_ref[0, s, 0, 0] + dy * rot_ref[0, s, 0, 3] + dz * rot_ref[0, s, 0, 6]
            )
            cols_y.append(
                dx * rot_ref[0, s, 0, 1] + dy * rot_ref[0, s, 0, 4] + dz * rot_ref[0, s, 0, 7]
            )
            cols_z.append(
                dx * rot_ref[0, s, 0, 2] + dy * rot_ref[0, s, 0, 5] + dz * rot_ref[0, s, 0, 8]
            )

    sx = jnp.concatenate(cols_x, axis=0)
    sy = jnp.concatenate(cols_y, axis=0)
    sz = jnp.concatenate(cols_z, axis=0)
    if normalize != 1.0:
        sx = sx * normalize
        sy = sy * normalize
        sz = sz * normalize
    return sx, sy, sz


def _crop_kernel(
    seed_ref,  # SMEM (1, SB, 1, 3)
    rot_ref,  # SMEM (1, SB, 1, 9)
    pts_ref,  # VMEM (1, 3*G, 128)
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,  # VMEM folded weights
    out_ref,  # VMEM (1, SB, D, C3)
    *,
    g: int,
    ns: int,
    ndepth: int,
    r2: float,
    hmin: float,
    hmaxs: Tuple[float, ...],
    normalize: float,
    ball: bool,
    sb: int,
):
    """Gathered gripper-frame offsets -> BN-folded MLP -> maxpool (eval)."""
    sx, sy, sz = _gather_grouped_core(
        seed_ref, rot_ref, pts_ref,
        g=g, ns=ns, ndepth=ndepth, r2=r2, hmin=hmin, hmaxs=hmaxs,
        normalize=normalize, ball=ball, sb=sb,
    )
    # one MLP over ALL (seed, depth, sample) rows of the block — (SB*D*NS, C)
    # matmuls keep the MXU busy instead of SB*D tiny ones.
    # MLP layer 1 (K=3): broadcast-sum, keeps the MXU out of a K=3 matmul
    h = jax.nn.relu(
        sx * w1_ref[0:1, :] + sy * w1_ref[1:2, :] + sz * w1_ref[2:3, :]
        + b1_ref[0:1, :]
    )  # (SB*D*NS, C1)
    h = jax.nn.relu(
        jnp.dot(h, w2_ref[:, :], preferred_element_type=jnp.float32)
        + b2_ref[0:1, :]
    )
    h = jax.nn.relu(
        jnp.dot(h, w3_ref[:, :], preferred_element_type=jnp.float32)
        + b3_ref[0:1, :]
    )  # (SB*D*NS, C3)
    pooled = h.reshape(sb, ndepth, ns, h.shape[-1]).max(axis=2)  # (SB, D, C3)
    out_ref[0, :, :, :] = pooled


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "hmin", "hmax_list", "nsample", "normalize", "ball", "sb"
    ),
)
def crop_fused_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array | None,
    folded_w: Tuple[jax.Array, ...],
    radius: float,
    hmin: float,
    hmax_list: Tuple[float, ...],
    nsample: int,
    normalize: float = 1.0,
    ball: bool = False,
    sb: int | None = None,
) -> jax.Array:
    """Fused CloudCrop: (B, Ns, D, C3) pooled features.

    Args:
      xyz: (B, N, 3) full cloud.
      new_xyz: (B, Ns, 3) crop centers.
      rot: (B, Ns, 3, 3) approach rotations.
      folded_w: (w1, b1, w2, b2, w3, b3) BN-folded MLP weights (fold_bn_eval).
      normalize: scale applied to gripper-frame offsets before the MLP
        (1.0 matches the reference CloudCrop, which does not normalize).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ndepth = len(hmax_list)
    g = -(-n // _LANE)
    c3 = folded_w[4].shape[1]
    if sb is None:
        if ball and m % 16 == 0:
            sb = 16  # single-depth programs are small; bigger blocks win
        else:
            sb = 8 if m % 8 == 0 else (4 if m % 4 == 0 else 1)

    planes = jnp.transpose(xyz, (0, 2, 1))
    if g * _LANE != n:
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, g * _LANE - n)),
            constant_values=_SENTINEL,
        )
    planes = planes.reshape(b, 3 * g, _LANE)

    kernel = functools.partial(
        _crop_kernel,
        g=g,
        ns=nsample,
        ndepth=ndepth,
        r2=radius * radius,
        hmin=hmin,
        hmaxs=tuple(hmax_list),
        normalize=normalize,
        ball=ball,
        sb=sb,
    )
    if rot is None:
        rot_flat = jnp.zeros((b, m, 9), xyz.dtype)
    else:
        rot_flat = rot.reshape(b, m, 9)
    w1, b1, w2, b2, w3, b3 = folded_w
    const = lambda i, j: (0, 0)  # noqa: E731
    return pl.pallas_call(
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
            pl.BlockSpec(w1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, sb, ndepth, c3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, ndepth, c3), jnp.float32),
    )(new_xyz[:, :, None, :], rot_flat[:, :, None, :], planes,
      w1, b1, w2, b2, w3, b3)


def _crop_group_kernel(
    seed_ref,  # SMEM (1, SB, 1, 3)
    rot_ref,  # SMEM (1, SB, 1, 9)
    pts_ref,  # VMEM (1, 3*G, 128)
    out_ref,  # VMEM (1, SB, D*NS, 3)
    *,
    g: int,
    ns: int,
    ndepth: int,
    r2: float,
    hmin: float,
    hmaxs: Tuple[float, ...],
    normalize: float,
    ball: bool,
    sb: int,
):
    """Gathered gripper-frame offsets, written out instead of embedded."""
    sx, sy, sz = _gather_grouped_core(
        seed_ref, rot_ref, pts_ref,
        g=g, ns=ns, ndepth=ndepth, r2=r2, hmin=hmin, hmaxs=hmaxs,
        normalize=normalize, ball=ball, sb=sb,
    )
    grouped = jnp.concatenate([sx, sy, sz], axis=1)  # (SB*D*NS, 3)
    out_ref[0, :, :, :] = grouped.reshape(sb, ndepth * ns, 3)


@functools.partial(
    jax.jit,
    static_argnames=(
        "radius", "hmin", "hmax_list", "nsample", "normalize", "ball", "sb"
    ),
)
def crop_group_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    rot: jax.Array | None,
    radius: float,
    hmin: float,
    hmax_list: Tuple[float, ...],
    nsample: int,
    normalize: float = 1.0,
    ball: bool = False,
    sb: int | None = None,
) -> jax.Array:
    """Fused cylinder query + group + center-subtract + gripper-frame rotate.

    The training-path front half of CloudCrop (reference CylinderQueryAndGroup,
    pointnet2_utils.py:461-530): one kernel replaces the Pallas index query +
    XLA gather + einsum rotate pipeline, and never materializes the
    (B, Ns, D, S) index tensor in HBM.  The batch-stats SharedMLP stays in
    XLA on top (it needs global BN reductions and weight gradients).

    NON-DIFFERENTIABLE by construction (inputs are stop-gradiented): in
    training the crop centers are label grasp points and the rotations are
    label view rotations — no gradient flows to them in the reference either
    (grouping indices are discrete; torch never differentiates labels/input
    data).

    Returns (B, Ns, D, nsample, 3) f32 gripper-frame offsets, bit-identical
    selection to the sequential-scan oracle and the unfused path's indices.
    """
    xyz = jax.lax.stop_gradient(xyz)
    new_xyz = jax.lax.stop_gradient(new_xyz)
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    ndepth = len(hmax_list)
    g = -(-n // _LANE)
    if sb is None:
        if ball and m % 16 == 0:
            sb = 16
        else:
            sb = 8 if m % 8 == 0 else (4 if m % 4 == 0 else 1)

    planes = jnp.transpose(xyz, (0, 2, 1))
    if g * _LANE != n:
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, g * _LANE - n)),
            constant_values=_SENTINEL,
        )
    planes = planes.reshape(b, 3 * g, _LANE)

    kernel = functools.partial(
        _crop_group_kernel,
        g=g,
        ns=nsample,
        ndepth=ndepth,
        r2=radius * radius,
        hmin=hmin,
        hmaxs=tuple(hmax_list),
        normalize=normalize,
        ball=ball,
        sb=sb,
    )
    if rot is None:
        rot_flat = jnp.zeros((b, m, 9), xyz.dtype)
    else:
        rot_flat = jax.lax.stop_gradient(rot).reshape(b, m, 9)
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
            (1, sb, ndepth * nsample, 3),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, ndepth * nsample, 3), jnp.float32),
    )(new_xyz[:, :, None, :], rot_flat[:, :, None, :], planes)
    return out.reshape(b, m, ndepth, nsample, 3)


def _sa_feat_kernel(
    seed_ref,  # SMEM (1, 1, 1, 3)
    pts_ref,  # VMEM (1, 3*G, 128)
    feat_ref,  # VMEM (1, N_pad, C)
    w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    out_ref,  # VMEM (1, 1, 1, C3)
    *,
    g: int,
    ns: int,
    r2: float,
    inv_radius: float,
):
    """SA stage with feature grouping (backbone sa2-4, eval mode):
    ball query -> gather xyz+features -> normalize -> MLP -> maxpool."""
    cx = seed_ref[0, 0, 0, 0]
    cy = seed_ref[0, 0, 0, 1]
    cz = seed_ref[0, 0, 0, 2]
    dx = pts_ref[0, 0:g, :] - cx
    dy = pts_ref[0, g : 2 * g, :] - cy
    dz = pts_ref[0, 2 * g : 3 * g, :] - cz
    d2 = dx * dx + dy * dy + dz * dz
    mask = (d2 < r2).astype(jnp.float32)

    idx_col, onehot, p_col, valid_col, total = _select_first_hits_vmem(mask, g, ns)

    # xyz of the selected samples via tile-row gather + lane select
    lane_iota = _fiota((ns, _LANE), 1)
    lhot = (lane_iota == p_col).astype(jnp.float32)

    def pick(plane):
        rows = jax.lax.dot_general(
            onehot, plane,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(rows * lhot, axis=1, keepdims=True)

    sx, sy, sz = pick(dx), pick(dy), pick(dz)
    first = lambda v: v[0:1, 0:1]  # noqa: E731
    p0 = (dx[0:1, 0:1], dy[0:1, 0:1], dz[0:1, 0:1])
    sx = jnp.where(total > 0.0, jnp.where(valid_col, sx, first(sx)), p0[0])
    sy = jnp.where(total > 0.0, jnp.where(valid_col, sy, first(sy)), p0[1])
    sz = jnp.where(total > 0.0, jnp.where(valid_col, sz, first(sz)), p0[2])
    sx = sx * inv_radius
    sy = sy * inv_radius
    sz = sz * inv_radius

    # features of the selected samples: onehot-over-N matmul with the FINAL
    # (padding-applied) indices, exactly what group_points does with them
    n_pad = g * _LANE
    nio = _fiota((ns, n_pad), 1)
    ef = (nio == idx_col).astype(jnp.float32)  # (NS, N_pad)
    sel_feat = jnp.dot(
        ef, feat_ref[0, :, :], preferred_element_type=jnp.float32
    )  # (NS, C)

    # MLP layer 1 over the [xyz | feat] concat: xyz part via broadcast-sum,
    # feature part as one MXU matmul against W1[3:]
    h = jax.nn.relu(
        sx * w1_ref[0:1, :] + sy * w1_ref[1:2, :] + sz * w1_ref[2:3, :]
        + jnp.dot(sel_feat, w1_ref[3:, :], preferred_element_type=jnp.float32)
        + b1_ref[0:1, :]
    )
    h = jax.nn.relu(
        jnp.dot(h, w2_ref[:, :], preferred_element_type=jnp.float32)
        + b2_ref[0:1, :]
    )
    h = jax.nn.relu(
        jnp.dot(h, w3_ref[:, :], preferred_element_type=jnp.float32)
        + b3_ref[0:1, :]
    )
    out_ref[0, 0, 0:1, :] = jnp.max(h, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def _sa_feat_fused(xyz, new_xyz, features, fw, radius, nsample):
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    g = -(-n // _LANE)
    c3 = fw[4].shape[1]

    planes = jnp.transpose(xyz, (0, 2, 1))
    if g * _LANE != n:
        planes = jnp.pad(
            planes, ((0, 0), (0, 0), (0, g * _LANE - n)),
            constant_values=_SENTINEL,
        )
        features = jnp.pad(features, ((0, 0), (0, g * _LANE - n), (0, 0)))
    planes = planes.reshape(b, 3 * g, _LANE)

    kernel = functools.partial(
        _sa_feat_kernel,
        g=g,
        ns=nsample,
        r2=radius * radius,
        inv_radius=1.0 / radius,
    )
    w1, b1, w2, b2, w3, b3 = fw
    const = lambda i, j: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(b, m),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, 3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 3 * g, _LANE), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, g * _LANE, features.shape[-1]),
                lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(w1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, const, memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, c3), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, m, 1, c3), jnp.float32),
    )(new_xyz[:, :, None, :], planes, features, w1, b1, w2, b2, w3, b3)
    return out[:, :, 0, :]


def sa_feat_fused_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array,
    mlp_layers,
    radius: float,
    nsample: int,
    eps: float,
) -> jax.Array:
    """Fused SA stage with feature grouping (backbone sa2-4, eval mode).

    Returns (B, M, mlp[-1]) pooled features.
    """
    folded = fold_bn_eval(mlp_layers, eps)
    fw = tuple(x for pair in folded for x in pair)
    return _sa_feat_fused(xyz, new_xyz, features, fw, radius, nsample)


def sa1_fused_pallas(
    xyz: jax.Array,
    new_xyz: jax.Array,
    mlp_layers,
    radius: float,
    nsample: int,
    eps: float,
) -> jax.Array:
    """Fused SA stage for xyz-only inputs (backbone sa1, eval mode).

    Ball query + group + center-subtract + /radius normalize + BN-folded
    SharedMLP + maxpool in one kernel (reference PointnetSAModuleVotes,
    pointnet2_modules.py:164-272, with normalize_xyz=True).

    Returns (B, M, mlp[-1]) pooled features.
    """
    folded = fold_bn_eval(mlp_layers, eps)
    fw = tuple(x for pair in folded for x in pair)
    out = crop_fused_pallas(
        xyz, new_xyz, None, fw,
        radius, 0.0, (0.0,), nsample,
        normalize=1.0 / radius, ball=True,
    )  # (B, M, 1, C)
    return out[:, :, 0, :]
