"""Native C++ host kernel parity tests (vs the numpy reference paths)."""

import time

import numpy as np
import pytest

from graspnet_tpu import native
from graspnet_tpu.postproc.voxel import voxel_down_sample
from graspnet_tpu.train.label_pipeline import fps_numpy


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
class TestNativeFPS:
    def test_matches_numpy(self, rng):
        pts = rng.uniform(-0.5, 0.5, (800, 3)).astype(np.float32)
        pts[rng.choice(800, 10, replace=False)] *= 1e-3  # near-origin skips
        want = fps_numpy(pts, 128)
        lib = native.get_lib()
        got = np.empty(128, dtype=np.int32)
        lib.gn_fps(np.ascontiguousarray(pts), 800, 128, got)
        np.testing.assert_array_equal(got, want)

    def test_batch(self, rng):
        pts = rng.uniform(-0.5, 0.5, (3, 400, 3)).astype(np.float32)
        lib = native.get_lib()
        out = np.empty((3, 64), dtype=np.int32)
        lib.gn_fps_batch(np.ascontiguousarray(pts), 3, 400, 64, out)
        for b in range(3):
            np.testing.assert_array_equal(out[b], fps_numpy(pts[b], 64))


@needs_native
class TestNativeNearest:
    def test_matches_argmin(self, rng):
        q = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
        r = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
        want = np.argmin(
            np.sum((q[:, None] - r[None]) ** 2, axis=-1), axis=1
        ).astype(np.int32)
        got = native.nearest(q, r)
        np.testing.assert_array_equal(got, want)


@needs_native
class TestNativeVoxel:
    def test_same_cells_and_centroids(self, rng):
        pts = rng.uniform(0, 0.2, (3000, 3)).astype(np.float32)
        a = native.voxel_downsample(pts, 0.02)
        b = voxel_down_sample(pts, 0.02)
        assert len(a) == len(b)
        # order differs; compare as sorted sets
        a_sorted = a[np.lexsort(a.T)]
        b_sorted = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a_sorted, b_sorted, atol=1e-5)


@needs_native
def test_grid_build_matches_numpy_construction(rng):
    """gn_grid_build must reproduce _SceneGrid's numpy construction
    byte-for-byte: same unique sorted keys, same group offsets, same
    per-cell membership with ascending order inside each cell, same
    min bound and dims."""
    for trial, n in enumerate((1, 7, 1000, 5000)):
        pts = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        cell = 0.08
        got = native.grid_build(pts, cell)
        assert got is not None
        order, uniq, starts, minb, dims = got
        p64 = pts.astype(np.float64)
        want_minb = p64.min(axis=0)
        coords = np.floor((p64 - want_minb) / cell).astype(np.int64)
        want_dims = coords.max(axis=0) + 1
        keys = (coords[:, 0] * want_dims[1] + coords[:, 1]) * want_dims[2] + coords[:, 2]
        want_order = np.argsort(keys, kind="stable")
        want_uniq, want_starts = np.unique(keys[want_order], return_index=True)
        np.testing.assert_array_equal(minb, want_minb)
        np.testing.assert_array_equal(dims, want_dims)
        np.testing.assert_array_equal(uniq, want_uniq)
        np.testing.assert_array_equal(starts[:-1], want_starts)
        assert starts[-1] == n
        np.testing.assert_array_equal(order, want_order)


def test_nearest_numpy_fallback_blocked(rng, monkeypatch):
    """The lib-less fallback must stay blocked (O(Nq x block) memory) and
    still match the full-broadcast argmin exactly, ref sizes straddling
    the 8192 block boundary included."""
    import graspnet_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    q = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
    for nr in (5, 8192, 8193, 20000):
        r = rng.uniform(-1, 1, (nr, 3)).astype(np.float32)
        got = native_mod.nearest(q, r)
        want = np.argmin(np.sum((q[:, None] - r[None]) ** 2, axis=-1), axis=1)
        np.testing.assert_array_equal(got, want)


def test_fallbacks_work_regardless(rng):
    """The public wrappers must work whether or not the lib built."""
    pts = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
    idx = native.fps(pts, 32)
    assert idx.shape == (32,) and idx[0] == 0
    nn = native.nearest(pts[:10], pts)
    np.testing.assert_array_equal(nn, np.arange(10))
    vox = native.voxel_downsample(pts, 0.05)
    assert 0 < len(vox) <= len(pts)


def test_label_view_stats_matches_numpy(rng):
    from graspnet_tpu import native

    npo, v, a, d = 37, 30, 4, 3
    scores = rng.uniform(-0.1, 1.2, (npo, v, a, d)).astype(np.float32)
    widths = rng.uniform(0, 0.15, (npo, v, a, d)).astype(np.float32)
    mw = 0.1
    lmin, has, vmax = native.label_view_stats(scores, widths, mw)

    mask = (scores > 0) & (widths <= mw)
    want_lmin = np.where(mask, scores, np.inf).reshape(npo, v, -1).min(axis=-1)
    want_has = mask.reshape(npo, v, -1).any(axis=-1)
    want_vmax = scores.reshape(npo, v, -1).max(axis=-1)
    np.testing.assert_array_equal(lmin, want_lmin.astype(np.float32))
    np.testing.assert_array_equal(has, want_has)
    np.testing.assert_array_equal(vmax, want_vmax.astype(np.float32))

    # empty object (fully occluded after visibility filtering)
    l0, h0, v0 = native.label_view_stats(
        np.zeros((0, v, a, d), np.float32), np.zeros((0, v, a, d), np.float32), mw
    )
    assert l0.shape == (0, v) and h0.shape == (0, v) and v0.shape == (0, v)


def test_greedy_suppress_matches_python(rng):
    from graspnet_tpu import native

    m = 200
    close = rng.random((m, m)) < 0.05
    close |= close.T
    np.fill_diagonal(close, True)
    order = rng.permutation(m).astype(np.int32)

    got = native.greedy_suppress(close, order)

    suppressed = np.zeros(m, dtype=bool)
    want = []
    for i in order:
        if suppressed[i]:
            continue
        want.append(i)
        suppressed |= close[i]
    np.testing.assert_array_equal(got, np.asarray(want))


def test_grasp_nms_fused_matches_matrix_path(rng):
    from graspnet_tpu import native

    m = 300
    T = rng.uniform(-0.2, 0.2, (m, 3)).astype(np.float32)
    Rm = np.linalg.qr(rng.normal(size=(m, 3, 3)))[0].astype(np.float32)
    Rf = Rm.reshape(m, 9)
    order = rng.permutation(m).astype(np.int32)
    tt, rt = 0.03, 30 / 180 * np.pi
    got = native.grasp_nms_fused(T, Rf, order, tt * tt, np.cos(rt))
    if got is None:
        import pytest

        pytest.skip("native lib unavailable")

    tr = Rf @ Rf.T
    cos = np.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    tn = np.sum(T * T, axis=1)
    d2 = tn[:, None] + tn[None, :] - 2.0 * (T @ T.T)
    close = (d2 < tt * tt) & (cos > np.cos(rt))
    want = native.greedy_suppress(close, order)
    np.testing.assert_array_equal(got, want)


def test_fps_grid_matches_linear_scan(rng):
    """gn_fps_grid (grid-pruned exact FPS) must select bit-identically to
    gn_fps across adversarial inputs: duplicates (sampling pads with
    replacement -> exact distance ties), clusters, near-origin invalid
    points, and degenerate planes."""
    from graspnet_tpu import native

    lib = native.get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")

    def run(fn, pts, m):
        out = np.empty(m, np.int32)
        fn(np.ascontiguousarray(pts, np.float32), len(pts), m, out)
        return out

    for trial in range(12):
        n = int(rng.integers(100, 22000))
        kind = trial % 4
        if kind == 0:
            pts = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        elif kind == 1:
            base = rng.uniform(-0.4, 0.4, (max(n // 3, 1), 3)).astype(np.float32)
            pts = base[rng.integers(0, len(base), n)]
        elif kind == 2:
            c = rng.uniform(-0.3, 0.3, (8, 3)).astype(np.float32)
            pts = (c[rng.integers(0, 8, n)] + rng.normal(0, 0.01, (n, 3))).astype(np.float32)
            pts[rng.random(n) < 0.05] = 0.0
        else:
            pts = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
            pts[:, 2] = 0.5
        m = int(rng.integers(1, min(n, 2048)))
        np.testing.assert_array_equal(
            run(lib.gn_fps, pts, m), run(lib.gn_fps_grid, pts, m),
            err_msg=f"trial {trial} n={n} m={m} kind={kind}",
        )
