"""AP evaluator tests: force closure geometry, precision math, PLY IO."""

import os

import numpy as np
import pytest

from graspnet_tpu.eval import (
    estimate_normals,
    find_contacts,
    force_closure_min_friction,
)
from graspnet_tpu.eval.ap import eval_frame, load_ply_points, precision_at_k
from graspnet_tpu.models.geometry import batch_viewpoint_params_to_matrix

import jax.numpy as jnp


def make_sphere(n=400, r=0.03, rng=None):
    rng = rng or np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32)


def make_grasp(center, approach, width=0.08, depth=0.02, score=1.0):
    """17-float grasp row from center + approach direction."""
    approach = np.asarray(approach, np.float32)
    R = np.asarray(
        batch_viewpoint_params_to_matrix(
            jnp.asarray(approach[None]), jnp.asarray(np.zeros(1, np.float32))
        )
    )[0]
    g = np.zeros(17, dtype=np.float32)
    g[0], g[1], g[2], g[3] = score, width, 0.02, depth
    g[4:13] = R.reshape(-1)
    g[13:16] = center
    g[16] = -1
    return g


class TestNormals:
    def test_sphere_normals_radial(self):
        pts = make_sphere()
        normals = estimate_normals(pts, k=12)
        radial = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        cos = np.abs(np.sum(normals * radial, axis=1))
        assert np.median(cos) > 0.98


class TestForceClosure:
    def test_sphere_center_grasp_closes(self):
        """A grasp centered on a sphere closes at low friction (antipodal)."""
        pts = make_sphere()
        normals = estimate_normals(pts, k=12)
        # approach along +x toward the center, fingers span the sphere
        g = make_grasp(center=[-0.045, 0, 0], approach=[1, 0, 0], width=0.08, depth=0.05)
        mu = force_closure_min_friction(pts, normals, g)
        assert mu <= 0.4, mu

    def test_tangential_grasp_fails_or_high_friction(self):
        """Fingers closing along a surface tangent need much more friction."""
        pts = make_sphere()
        normals = estimate_normals(pts, k=12)
        # grasp far off-center: contacts near the pole, normals nearly
        # perpendicular to the closing line
        g = make_grasp(center=[-0.04, 0.0, 0.028], approach=[1, 0, 0], width=0.03, depth=0.045)
        mu = force_closure_min_friction(pts, normals, g)
        center_mu = force_closure_min_friction(
            pts, normals, make_grasp([-0.045, 0, 0], [1, 0, 0], 0.08, 0.05)
        )
        assert mu > center_mu

    def test_no_contact_returns_inf(self):
        pts = make_sphere()
        normals = estimate_normals(pts, k=12)
        g = make_grasp(center=[1.0, 1.0, 1.0], approach=[1, 0, 0])
        assert np.isinf(force_closure_min_friction(pts, normals, g))

    def test_contacts_opposite_sides(self):
        pts = make_sphere()
        g = make_grasp(center=[-0.045, 0, 0], approach=[1, 0, 0], width=0.08, depth=0.05)
        c = find_contacts(pts, g)
        assert c is not None
        i, j = c
        assert pts[i, 1] < 0 < pts[j, 1]


class TestPrecision:
    def test_all_positive(self):
        p = precision_at_k(np.linspace(1, 0, 50), np.ones(50, bool))
        np.testing.assert_allclose(p, 1.0)

    def test_half(self):
        scores = np.linspace(1, 0, 50)
        positive = np.zeros(50, bool)
        positive[::2] = True  # alternating from the top
        p = precision_at_k(scores, positive)
        assert abs(p[-1] - 0.5) < 0.02
        assert p[0] == 1.0

    def test_short_list_pads_negative(self):
        p = precision_at_k(np.ones(10), np.ones(10, bool))
        assert p[9] == 1.0 and p[49] == pytest.approx(10 / 50)


class TestEvalFrame:
    def test_good_grasps_score_high(self):
        rng = np.random.default_rng(0)
        pts = make_sphere(rng=rng)
        normals = estimate_normals(pts, k=12)
        pose = np.concatenate([np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [0.4]], np.float32)], 1)
        # 10 antipodal grasps approaching the posed sphere from directions
        # 36° apart — outside the protocol NMS's 30° rotation threshold, so
        # all 10 survive the pre-top-50 NMS
        grasps = []
        for i in range(10):
            a = 2 * np.pi * i / 10
            d = np.array([np.cos(a), np.sin(a), 0.0], np.float32)
            grasps.append(
                make_grasp(
                    np.array([0, 0, 0.4], np.float32) - 0.045 * d,
                    d, 0.08, 0.05, score=1.0 - 0.01 * i,
                )
            )
        grasps = np.stack(grasps)
        ap = eval_frame(grasps, [pts], [normals], [pose], collision_thresh=1e9)
        # 10 of 50 slots filled with positives at most frictions
        assert ap[-1] >= 10 / 50 * 0.5

    def test_protocol_nms_collapses_duplicates(self):
        # co-located duplicates count ONCE after the protocol's NMS; raw
        # scoring (apply_nms=False) keeps all copies
        rng = np.random.default_rng(0)
        pts = make_sphere(rng=rng)
        normals = estimate_normals(pts, k=12)
        pose = np.concatenate([np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [0.4]], np.float32)], 1)
        grasps = np.stack(
            [
                make_grasp([-0.045, 0.0, 0.4], [1, 0, 0], 0.08, 0.05, score=1.0 - 0.01 * i)
                for i in range(10)
            ]
        )
        ap_nms = eval_frame(grasps, [pts], [normals], [pose], collision_thresh=1e9)
        ap_raw = eval_frame(
            grasps, [pts], [normals], [pose], collision_thresh=1e9, apply_nms=False
        )
        assert ap_raw[-1] > ap_nms[-1] > 0.0

    def test_empty(self):
        ap = eval_frame(np.zeros((0, 17), np.float32), [], [], [])
        np.testing.assert_array_equal(ap, 0)


class TestPLY:
    def test_ascii_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(20, 3)).astype(np.float32)
        path = str(tmp_path / "m.ply")
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for p in pts:
                f.write(f"{p[0]} {p[1]} {p[2]}\n")
        got = load_ply_points(path)
        np.testing.assert_allclose(got, pts, rtol=1e-5)

    def test_binary_roundtrip(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(15, 3)).astype(np.float32)
        path = str(tmp_path / "m.ply")
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(f"element vertex {len(pts)}\n".encode())
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"end_header\n")
            f.write(pts.astype("<f4").tobytes())
        got = load_ply_points(path)
        np.testing.assert_allclose(got, pts, rtol=1e-6)
