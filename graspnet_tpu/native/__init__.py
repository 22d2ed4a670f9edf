"""ctypes loader for the native host kernels (graspnet_host.cpp).

Builds the shared library with g++ on first use (cached next to the source);
every entry point has a numpy fallback with identical semantics, so the
framework works without a toolchain — the native path just makes the host
data pipeline ~20x faster (FPS seed chains, voxel downsampling of ~1M-point
service clouds).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "src", "graspnet_host.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libgraspnet_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-fPIC", "-shared", "-fopenmp",
        "-o", _LIB, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # retry without OpenMP (some toolchains lack libgomp)
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception:
            return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.gn_fps.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.gn_fps_grid.argtypes = [f32p, ctypes.c_int, ctypes.c_int, i32p]
        lib.gn_fps_batch.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p,
        ]
        lib.gn_nearest.argtypes = [f32p, ctypes.c_int, f32p, ctypes.c_int, i32p]
        lib.gn_voxel_downsample.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_float, f32p,
        ]
        lib.gn_voxel_downsample.restype = ctypes.c_int
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.gn_label_view_stats.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, f32p, u8p, f32p,
        ]
        lib.gn_visible.argtypes = [
            f32p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_float, u8p,
        ]
        lib.gn_label_view_stats_masked.argtypes = [
            f32p, ctypes.POINTER(ctypes.c_float), u8p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64, ctypes.c_float,
            f32p, u8p, f32p,
        ]
        lib.gn_greedy_suppress.argtypes = [u8p, i32p, ctypes.c_int, i32p]
        lib.gn_greedy_suppress.restype = ctypes.c_int
        lib.gn_grasp_nms.argtypes = [
            f32p, f32p, i32p, ctypes.c_int, ctypes.c_float, ctypes.c_float, i32p,
        ]
        lib.gn_grasp_nms.restype = ctypes.c_int
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.gn_grid_build.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_double, i32p, u64p, i64p,
            f64p, i64p,
        ]
        lib.gn_grid_build.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """(N,3) float32 -> (npoint,) int32 FPS indices (native or fallback)."""
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, dtype=np.float32)
    if lib is None:
        from graspnet_tpu.train.label_pipeline import fps_numpy

        return fps_numpy(xyz, npoint)
    out = np.empty(npoint, dtype=np.int32)
    # grid-pruned exact variant: bit-identical selections, ~3x at 20k pts
    # (falls back to the linear scan internally below 4096 points)
    lib.gn_fps_grid(xyz, xyz.shape[0], npoint, out)
    return out


def nearest(query: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """(Nq,3),(Nr,3) -> (Nq,) int32 nearest-ref index per query."""
    lib = get_lib()
    query = np.ascontiguousarray(query, dtype=np.float32)
    ref = np.ascontiguousarray(ref, dtype=np.float32)
    if lib is None:
        # blocked over ref so the fallback stays O(Nq x block) memory —
        # a full (Nq, Nr, 3) broadcast is gigabytes for eval-sized scenes.
        # Strictly-less update keeps the first-occurrence argmin the C++
        # path and np.argmin share.
        out = np.zeros(len(query), dtype=np.int32)
        best = np.full(len(query), np.inf, dtype=np.float32)
        step = 8192
        for s in range(0, len(ref), step):
            d2 = np.sum(
                (query[:, None] - ref[None, s : s + step]) ** 2, axis=-1
            )
            arg = d2.argmin(axis=1)
            dmin = d2[np.arange(len(query)), arg]
            upd = dmin < best
            best[upd] = dmin[upd]
            out[upd] = (arg[upd] + s).astype(np.int32)
        return out
    out = np.empty(len(query), dtype=np.int32)
    lib.gn_nearest(query, len(query), ref, len(ref), out)
    return out


def label_view_stats(scores: np.ndarray, widths: np.ndarray, max_width: float):
    """Fused per-(point, view) label stats for the compact training path.

    (Np, V, A, D) scores/widths -> lmin (Np, V) f32, has (Np, V) bool,
    vmax (Np, V) f32 in one pass (see gn_label_view_stats).
    """
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    widths = np.ascontiguousarray(widths, dtype=np.float32)
    npo, v = scores.shape[0], scores.shape[1]
    ad = int(np.prod(scores.shape[2:], dtype=np.int64)) if scores.ndim > 2 else 1
    lib = get_lib()
    if lib is None or npo == 0:
        mask = (scores > 0) & (widths <= max_width)
        lmin = np.where(mask, scores, np.inf).reshape(npo, v, ad).min(
            axis=-1, initial=np.inf
        )
        has = mask.reshape(npo, v, ad).any(axis=-1)
        vmax = scores.reshape(npo, v, ad).max(axis=-1, initial=-np.inf)
        return lmin.astype(np.float32), has, vmax.astype(np.float32)
    lmin = np.empty((npo, v), np.float32)
    has = np.empty((npo, v), np.uint8)
    vmax = np.empty((npo, v), np.float32)
    lib.gn_label_view_stats(
        scores.reshape(-1), widths.reshape(-1), npo, v, ad,
        np.float32(max_width), lmin, has, vmax,
    )
    return lmin, has.astype(bool), vmax


def visible_mask(cloud: np.ndarray, pts: np.ndarray, th: float):
    """(N,3) scene cloud, (M,3) query points -> (M,) bool visibility.

    Exact grid-hash version of the reference's min-distance < th test
    (utils/data_utils.py:91-112); returns None when the lib is missing so
    the caller can fall back to the numpy matrix path.
    """
    lib = get_lib()
    if lib is None:
        return None
    cloud = np.ascontiguousarray(cloud, dtype=np.float32)
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    out = np.empty(len(pts), dtype=np.uint8)
    lib.gn_visible(cloud, len(cloud), pts, len(pts), np.float32(th), out)
    return out.astype(bool)


def label_view_stats_masked(
    scores: np.ndarray,
    widths: np.ndarray,
    collision: np.ndarray,
    max_width: float,
):
    """Per-(point, view) stats of the collision-ZEROED full label slabs.

    Bit-identical to label_view_stats(where(collision, 0, scores), widths)
    without materializing the zeroed copy.  `widths` may be a uniformly
    strided view (e.g. the width channel offsets[..., 2] of a contiguous
    (Np, V, A, D, 3) offsets tensor); scores/collision must be contiguous.
    Used to build the per-(scene, object) stat cache the compact training
    path gathers rows from (reference graspnet_dataset.py:227-232 zeroing
    + label_generation.py:111-117 reductions).
    """
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    collision = np.ascontiguousarray(collision).astype(np.uint8, copy=False)
    npo, v = scores.shape[0], scores.shape[1]
    ad = int(np.prod(scores.shape[2:], dtype=np.int64)) if scores.ndim > 2 else 1
    lib = get_lib()
    widths = np.asarray(widths, dtype=np.float32)
    if lib is None or npo == 0:
        zeroed = np.where(collision.reshape(scores.shape).astype(bool), 0.0, scores)
        return label_view_stats(zeroed, np.ascontiguousarray(widths), max_width)
    # uniform element stride in floats (contiguous -> 1; offsets[...,2] -> 3)
    strides = np.array(widths.strides, np.int64) // 4
    wstride = int(strides[-1]) if widths.ndim else 1
    # all leading strides must equal wstride * row-major extent products
    ok = True
    acc = wstride
    for dim in range(widths.ndim - 1, 0, -1):
        acc *= widths.shape[dim]
        ok = ok and strides[dim - 1] == acc
    if not ok:
        widths = np.ascontiguousarray(widths)
        wstride = 1
    lmin = np.empty((npo, v), np.float32)
    has = np.empty((npo, v), np.uint8)
    vmax = np.empty((npo, v), np.float32)
    wptr = ctypes.cast(widths.ctypes.data, ctypes.POINTER(ctypes.c_float))
    lib.gn_label_view_stats_masked(
        scores.reshape(-1), wptr, collision.reshape(-1), npo, v, ad,
        np.int64(wstride), np.float32(max_width), lmin, has, vmax,
    )
    return lmin, has.astype(bool), vmax


def grasp_nms_fused(
    t: np.ndarray, r: np.ndarray, order: np.ndarray, tt2: float, cos_rt: float
):
    """Fused greedy grasp NMS; returns kept indices or None w/o the lib."""
    lib = get_lib()
    if lib is None:
        return None
    m = len(order)
    t = np.ascontiguousarray(t, dtype=np.float32)
    r = np.ascontiguousarray(r, dtype=np.float32)
    order = np.ascontiguousarray(order, dtype=np.int32)
    keep = np.empty(m, dtype=np.int32)
    nk = lib.gn_grasp_nms(
        t, r, order, m, np.float32(tt2), np.float32(cos_rt), keep
    )
    return keep[:nk].astype(np.int64)


def greedy_suppress(close: np.ndarray, order: np.ndarray) -> np.ndarray:
    """Greedy NMS pass: (M, M) bool close matrix + visit order -> kept indices."""
    m = len(order)
    close = np.ascontiguousarray(close, dtype=np.uint8)
    order = np.ascontiguousarray(order, dtype=np.int32)
    lib = get_lib()
    if lib is None:
        suppressed = np.zeros(m, dtype=bool)
        keep = []
        cb = close.astype(bool)
        for i in order:
            if suppressed[i]:
                continue
            keep.append(i)
            suppressed |= cb[i]
        return np.asarray(keep, dtype=np.int64)
    keep = np.empty(m, dtype=np.int32)
    nk = lib.gn_greedy_suppress(close.reshape(-1), order, m, keep)
    return keep[:nk].astype(np.int64)


def grid_build(pts: np.ndarray, cell: float):
    """Uniform-grid index over (N, 3) points for eval/ap._SceneGrid.

    Returns (order, uniq_keys, starts, minb, dims): point indices grouped
    by cell (ascending within each cell), the SORTED unique packed cell
    keys, group offsets (len ncells+1), the float64 min bound, and the
    grid dims — byte-identical to the numpy argsort/unique construction
    (same float64 quantization and packing), built in two O(N) passes.
    Returns None when the native lib is unavailable (callers keep their
    numpy path), or when the input is not float32 — the byte-parity claim
    holds only for float32 points (the native path quantizes the float32
    values in float64 exactly as numpy does; a float64 input would be
    downcast first, shifting boundary points into different cells).
    """
    lib = get_lib()
    pts = np.asarray(pts)
    if lib is None or pts.dtype != np.float32:
        return None
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    n = len(pts)
    if n == 0:
        return (
            np.empty(0, np.int32), np.empty(0, np.uint64),
            np.zeros(1, np.int64), np.zeros(3, np.float64),
            np.zeros(3, np.int64),
        )
    order = np.empty(n, np.int32)
    keys = np.empty(n, np.uint64)
    starts = np.empty(n + 1, np.int64)
    minb = np.empty(3, np.float64)
    dims = np.empty(3, np.int64)
    nc = lib.gn_grid_build(pts, n, float(cell), order, keys, starts, minb, dims)
    # int64 keys to match the numpy construction's dtype (packed coords
    # are far below 2^63 — dims are per-axis cell counts of a real scene)
    return order, keys[:nc].astype(np.int64), starts[: nc + 1].copy(), minb, dims


def voxel_downsample(pts: np.ndarray, voxel: float) -> np.ndarray:
    """(N,3) -> (K,3) voxel centroids (unordered)."""
    lib = get_lib()
    pts = np.ascontiguousarray(pts, dtype=np.float32)
    if lib is None:
        from graspnet_tpu.postproc.voxel import voxel_down_sample

        return voxel_down_sample(pts, voxel)
    out = np.empty_like(pts)
    k = lib.gn_voxel_downsample(pts, len(pts), voxel, out)
    return out[:k].copy()
