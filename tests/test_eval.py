"""AP evaluator tests: every protocol stage pinned by hand-computed fixtures.

The official graspnetAPI evaluator (and the GraspNet-1B dataset models it
scores against) are absent from this environment, so each stage of the
re-derived protocol (eval/ap.py docstring) is pinned independently with
synthetic geometry whose expected outcome is computable by hand:
selection (per-object top-10 + global top-50 min-score cut), the binary
gripper-volume collision + empty-jaw check, the dexnet-style antipodal
contact search / force-closure test / score->mu mapping, and the exact
accuracy-matrix formula including its short-list branch.
"""

import numpy as np
import pytest

from graspnet_tpu.eval import (
    FRICTIONS,
    accuracy_matrix,
    antipodal_contacts,
    collision_and_empty,
    estimate_normals,
    eval_frame,
    force_closure_2pt,
    min_friction,
    summarize,
)
from graspnet_tpu.eval.ap import (
    TOP_K,
    create_table_points,
    load_ply_points,
)
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


class TestForceClosure2pt:
    """Hand-computed fixtures for the dexnet force_closure transcription."""

    def test_perfect_antipodal_closes_at_min_friction(self):
        p1, p2 = np.array([0.0, -0.01, 0]), np.array([0.0, 0.01, 0])
        n = np.array([0.0, 1.0, 0.0])  # normals along the contact line
        assert force_closure_2pt(p1, n, p2, n, 0.2)

    def test_exact_cone_boundary(self):
        """Contact line at exactly arctan(mu) from the normal: inside the
        cone at that mu (>=), outside at any smaller mu."""
        mu = 0.6
        # normal along y; contact line tilted by alpha = arctan(mu) from y
        alpha = np.arctan(mu)
        d = np.array([np.sin(alpha), np.cos(alpha), 0.0])
        p1 = np.zeros(3)
        p2 = 0.02 * d
        n = np.array([0.0, 1.0, 0.0])
        assert force_closure_2pt(p1, n, p2, n, mu + 1e-6)
        assert not force_closure_2pt(p1, n, p2, n, 0.4)

    def test_orientation_free(self):
        """use_abs_value semantics: flipping either normal changes nothing."""
        p1, p2 = np.array([0.0, -0.01, 0]), np.array([0.0, 0.01, 0])
        n = np.array([0.0, 1.0, 0.0])
        assert force_closure_2pt(p1, -n, p2, n, 0.2)
        assert force_closure_2pt(p1, n, p2, -n, 0.2)

    def test_coincident_contacts_fail(self):
        p = np.array([0.0, 0.0, 0.0])
        n = np.array([0.0, 1.0, 0.0])
        assert not force_closure_2pt(p, n, p, n, 1.2)


class TestAntipodalContacts:
    def test_first_crossing_per_jaw(self):
        """A two-wall box slice: each jaw must contact ITS nearest wall,
        not the extreme point of the union (the old extreme-y heuristic
        breaks when a third surface sits between the fingers)."""
        # walls at y = ±0.01, plus an inner ridge at y = 0.004
        wall = np.array(
            [[0.0, -0.01, 0.0], [0.0, 0.01, 0.0], [0.0, 0.004, 0.0]], np.float32
        )
        c = antipodal_contacts(wall, np.zeros(3), np.array([0, 1, 0.0]), width=0.04)
        assert c == (0, 1)

    def test_candidates_limited_to_tube(self):
        pts = np.array(
            [[0.0, -0.01, 0.0], [0.0, 0.01, 0.02]], np.float32
        )  # second point 2 cm off the closing line
        c = antipodal_contacts(pts, np.zeros(3), np.array([0, 1, 0.0]), width=0.04)
        assert c is None  # one candidate only -> coincident -> None

    def test_outside_jaw_span_ignored(self):
        pts = np.array([[0.0, -0.05, 0.0], [0.0, 0.05, 0.0]], np.float32)
        c = antipodal_contacts(pts, np.zeros(3), np.array([0, 1, 0.0]), width=0.04)
        assert c is None

    def test_no_points_returns_none(self):
        pts = np.zeros((0, 3), np.float32)
        assert antipodal_contacts(pts, np.zeros(3), np.array([0, 1, 0.0]), 0.04) is None


class TestMinFriction:
    def test_score_is_minimal_passing_mu(self):
        """Two flat plates tilted so closure first holds at mu=0.6 exactly
        (score->mu mapping: minimal friction in the ladder that passes)."""
        # plates at y=±0.01 with normals tilted 0.5 rad (tan 0.5 ≈ 0.546)
        # from the closing line: arctan(0.4) ≈ 0.38 < 0.5 < arctan(0.6) ≈ 0.54
        theta = 0.5
        n_tilt = np.array([np.sin(theta), np.cos(theta), 0.0], np.float32)
        pts = np.array([[0.0, -0.01, 0.0], [0.0, 0.01, 0.0]], np.float32)
        normals = np.stack([n_tilt, n_tilt])
        mu = min_friction(pts, normals, np.zeros(3), np.array([0, 1, 0.0]), 0.04)
        assert mu == pytest.approx(0.6)

    def test_never_closing_returns_minus_one(self):
        """Normals perpendicular to the closing line: no closure at any mu
        in the ladder (arctan(1.2) = 50° < 90°)."""
        pts = np.array([[0.0, -0.01, 0.0], [0.0, 0.01, 0.0]], np.float32)
        normals = np.array([[1.0, 0, 0], [1.0, 0, 0]], np.float32)
        assert min_friction(pts, normals, np.zeros(3), np.array([0, 1, 0.0]), 0.04) == -1.0

    def test_sphere_center_grasp_closes_cheaply(self):
        pts = make_sphere()
        normals = estimate_normals(pts, k=12)
        mu = min_friction(pts, normals, np.zeros(3), np.array([0, 1, 0.0]), 0.08)
        assert 0 < mu <= 0.4


class TestCollisionAndEmpty:
    def _grasp(self, width=0.04, depth=0.04):
        return make_grasp([0, 0, 0], [1, 0, 0], width=width, depth=depth)[None]

    def test_point_between_jaws_is_inner_not_collision(self):
        pts = np.tile(np.array([[0.02, 0.0, 0.0]], np.float32), (12, 1))
        coll, empty, cen = collision_and_empty(self._grasp(), pts)
        assert not coll[0] and not empty[0]
        np.testing.assert_allclose(cen[0], [0.02, 0, 0], atol=1e-6)

    def test_point_in_left_finger_collides(self):
        # left finger occupies y in (-w/2-fw, -w/2) = (-0.03, -0.02)
        pts = np.array([[0.02, -0.025, 0.0]], np.float32)
        coll, _, _ = collision_and_empty(self._grasp(), pts)
        assert coll[0]

    def test_point_in_right_finger_collides(self):
        pts = np.array([[0.02, 0.025, 0.0]], np.float32)
        assert collision_and_empty(self._grasp(), pts)[0][0]

    def test_point_behind_base_collides(self):
        # bottom plate: x in (-0.03, -0.02], any y within the jaw+finger span
        pts = np.array([[-0.025, 0.0, 0.0]], np.float32)
        assert collision_and_empty(self._grasp(), pts)[0][0]

    def test_point_outside_height_slab_ignored(self):
        pts = np.array([[0.02, -0.025, 0.02]], np.float32)  # |z| > h/2 = 0.01
        coll, empty, _ = collision_and_empty(self._grasp(), pts)
        assert not coll[0] and empty[0]

    def test_fewer_than_10_inner_points_is_empty(self):
        pts = np.tile(np.array([[0.02, 0.0, 0.0]], np.float32), (9, 1))
        _, empty, _ = collision_and_empty(self._grasp(), pts)
        assert empty[0]

    def test_grid_pruned_bitwise_identical(self, rng):
        """The _SceneGrid prune must change NOTHING: collision flags,
        empty flags, and centroids bit-equal to the unpruned sweep across
        random grasps (incl. ones whose volume hangs outside the scene's
        grid bounds entirely)."""
        from graspnet_tpu.eval.ap import _SceneGrid

        for trial in range(8):
            pts = rng.uniform(-0.4, 0.4, (5000, 3)).astype(np.float32)
            m = 40
            g = np.zeros((m, 17), np.float32)
            g[:, 0] = rng.uniform(0, 1, m)
            g[:, 1] = rng.uniform(0.01, 0.1, m)
            g[:, 2] = rng.uniform(0.01, 0.04, m)
            g[:, 3] = rng.uniform(0.01, 0.05, m)
            import scipy.spatial.transform as st

            g[:, 4:13] = (
                st.Rotation.random(m, random_state=trial)
                .as_matrix()
                .reshape(m, 9)
                .astype(np.float32)
            )
            # centers: mostly inside the cloud, a few far outside the grid
            g[:, 13:16] = rng.uniform(-0.45, 0.45, (m, 3))
            g[:5, 13:16] = rng.uniform(2.0, 3.0, (5, 3))
            want = collision_and_empty(g, pts)
            got = collision_and_empty(g, pts, grid=_SceneGrid(pts))
            for a, b in zip(got, want):
                np.testing.assert_array_equal(a, b)

    def test_grid_empty_scene(self):
        from graspnet_tpu.eval.ap import _SceneGrid

        pts = np.zeros((0, 3), np.float32)
        coll, empty, cen = collision_and_empty(
            self._grasp(), pts, grid=_SceneGrid(pts)
        )
        assert not coll[0] and empty[0]


class TestAccuracyMatrix:
    def test_exact_formula(self):
        """Hand-computed: scores (already confidence-sorted) =
        [0.2, -1, 0.8, 1.2] -> acc[k, f] = #(0 < s <= mu_f in first k+1)/(k+1)."""
        s = np.array([0.2, -1.0, 0.8, 1.2], np.float32)
        acc = accuracy_matrix(s)
        assert acc.shape == (TOP_K, len(FRICTIONS))
        # k=0: first grasp only, mu*=0.2 -> hit at every friction level
        np.testing.assert_allclose(acc[0], 1.0)
        # k=1: [0.2, -1]: 1 hit / 2
        np.testing.assert_allclose(acc[1], 0.5)
        # k=2: [0.2, -1, 0.8]: at mu=0.2: 1/3; at 0.8: 2/3
        assert acc[2, 0] == pytest.approx(1 / 3)
        assert acc[2, 3] == pytest.approx(2 / 3)
        # k=3: adds mu*=1.2: hits only at the 1.2 column
        assert acc[3, 5] == pytest.approx(3 / 4)
        assert acc[3, 4] == pytest.approx(2 / 4)

    def test_short_list_branch_keeps_kplus1_denominator(self):
        """k+1 > len(scores): the FULL list's hits over k+1 (graspnetAPI's
        exact else-branch — missing grasps count against precision)."""
        s = np.array([0.2, 0.2], np.float32)
        acc = accuracy_matrix(s)
        assert acc[1, 0] == pytest.approx(1.0)
        assert acc[9, 0] == pytest.approx(2 / 10)
        assert acc[TOP_K - 1, 0] == pytest.approx(2 / TOP_K)

    def test_empty_scores(self):
        np.testing.assert_array_equal(accuracy_matrix(np.zeros(0, np.float32)), 0)

    def test_boundary_score_counts_at_its_own_friction(self):
        """score <= fric uses the same float ladder, so mu*=0.6 counts at
        the 0.6 column but not at 0.4."""
        s = np.array([float(FRICTIONS[2])], np.float32)  # 0.6
        acc = accuracy_matrix(s)
        assert acc[0, 2] == 1.0 and acc[0, 1] == 0.0


class TestSelection:
    def test_per_object_top10_then_min_score_cut(self, rng):
        """Two objects, 30 grasps each: per-object top-10 keeps 20 total,
        all above the 50th-best threshold -> 20 scored rows, and the 20
        SHOULD be the highest-confidence 10 of each object."""
        sphere_a = make_sphere(rng=np.random.default_rng(1))
        sphere_b = make_sphere(rng=np.random.default_rng(2))
        normals_a = estimate_normals(sphere_a, k=12)
        normals_b = estimate_normals(sphere_b, k=12)
        pose_a = np.concatenate([np.eye(3, dtype=np.float32), [[0.0], [0.0], [0.4]]], 1)
        pose_b = np.concatenate([np.eye(3, dtype=np.float32), [[0.3], [0.0], [0.4]]], 1)
        grasps = []
        for oi, cx in ((0, 0.0), (1, 0.3)):
            for i in range(30):
                a = 2 * np.pi * i / 30
                d = np.array([np.cos(a), np.sin(a), 0.0], np.float32)
                grasps.append(
                    make_grasp(
                        np.array([cx, 0, 0.4], np.float32) - 0.045 * d,
                        d, 0.08, 0.05, score=1.0 - 0.001 * i - 0.3 * oi,
                    )
                )
        grasps = np.stack(grasps)
        acc = eval_frame(
            grasps,
            [sphere_a.astype(np.float32), sphere_b.astype(np.float32)],
            [normals_a, normals_b],
            [pose_a.astype(np.float32), pose_b.astype(np.float32)],
            apply_nms=False,  # directions 12° apart would collapse under NMS
        )
        # exactly 20 rows scored: acc at k=19 > 0, and the k+1>20 branch
        # freezes the hit count afterwards: acc[k] = hits/(k+1) decreasing
        assert acc[19, -1] > 0
        assert acc[20, -1] == pytest.approx(acc[19, -1] * 20 / 21)
        assert acc[49, -1] == pytest.approx(acc[19, -1] * 20 / 50)


class TestEvalFrame:
    def test_good_grasps_score_high(self):
        rng = np.random.default_rng(0)
        pts = make_sphere(rng=rng)
        normals = estimate_normals(pts, k=12)
        pose = np.concatenate(
            [np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [0.4]], np.float32)], 1
        )
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
        acc = eval_frame(grasps, [pts], [normals], [pose])
        # all 10 close cheaply; with the k+1 denominator the last row is
        # bounded by 10/50
        assert acc[9, -1] > 0.8
        assert acc[-1, -1] >= 10 / 50 * 0.5

    def test_protocol_nms_collapses_duplicates(self):
        # co-located duplicates count ONCE after the protocol's NMS; raw
        # scoring (apply_nms=False) keeps all copies
        rng = np.random.default_rng(0)
        pts = make_sphere(rng=rng)
        normals = estimate_normals(pts, k=12)
        pose = np.concatenate(
            [np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [0.4]], np.float32)], 1
        )
        grasps = np.stack(
            [
                make_grasp([-0.045, 0.0, 0.4], [1, 0, 0], 0.08, 0.05, score=1.0 - 0.01 * i)
                for i in range(10)
            ]
        )
        acc_nms = eval_frame(grasps, [pts], [normals], [pose])
        acc_raw = eval_frame(grasps, [pts], [normals], [pose], apply_nms=False)
        assert acc_raw[9, -1] > acc_nms[9, -1] > 0.0

    def test_table_points_cause_collision(self):
        """A grasp whose fingers dip below the table plane is rejected when
        the table slab is passed."""
        rng = np.random.default_rng(0)
        pts = make_sphere(rng=rng)
        normals = estimate_normals(pts, k=12)
        pose = np.concatenate(
            [np.eye(3, dtype=np.float32), np.array([[0.0], [0.0], [0.028]], np.float32)], 1
        )
        # sphere sits just above z=0 'table'; sideways grasp at sphere
        # center: fingers reach z in [-0.01, 0.01] around z=0.028 -> clear,
        # but a grasp at z=0.005 pokes into the slab below z=0
        table = create_table_points(0.4, 0.4, 0.02, dx=-0.2, dy=-0.2, dz=-0.02, grid_size=0.004)
        g_low = make_grasp([-0.045, 0.0, 0.004], [1, 0, 0], 0.08, 0.05)[None]
        acc_no_table = eval_frame(g_low, [pts], [normals], [pose])
        acc_table = eval_frame(g_low, [pts], [normals], [pose], table=table)
        assert acc_table.max() == 0.0
        assert acc_no_table.max() >= 0.0  # sanity: runs without the table

    def test_empty(self):
        acc = eval_frame(np.zeros((0, 17), np.float32), [], [], [])
        np.testing.assert_array_equal(acc, 0)
        assert acc.shape == (TOP_K, len(FRICTIONS))


class TestSummarize:
    def test_column_means(self):
        res = np.zeros((2, TOP_K, len(FRICTIONS)), np.float32)
        res[..., 3] = 0.5  # mu = 0.8 column
        res[..., 1] = 0.25  # mu = 0.4 column
        s = summarize(res)
        assert s["AP0.8"] == pytest.approx(50.0)
        assert s["AP0.4"] == pytest.approx(25.0)
        assert s["AP"] == pytest.approx((0.5 + 0.25) / 6 * 100)

    def test_empty(self):
        assert summarize(np.zeros((0,)))["AP"] == 0.0


class TestTablePoints:
    def test_grid_bounds_and_spacing(self):
        t = create_table_points()
        assert t[:, 0].min() == pytest.approx(-0.5)
        assert t[:, 2].max() <= 0.0 and t[:, 2].min() == pytest.approx(-0.05)
        # grid spacing 0.008 along x
        xs = np.unique(t[:, 0])
        np.testing.assert_allclose(np.diff(xs), 0.008, atol=1e-6)


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


class TestAnalyticEndToEnd:
    """Full eval_frame -> accuracy_matrix -> summarize chain on a scene whose
    ENTIRE accuracy matrix is derivable by hand (round-2 verdict item: the
    strongest in-environment anchor for official-evaluator fidelity).

    Scene: two 14-point objects, each a symmetric inner cluster (12 points,
    pairwise +-p so the dexnet inner-centroid is exactly zero) plus two
    contact points on the closing line at y = +-0.018.  Contact normals are
    constructed analytically, tilted tan(theta) away from the closing axis,
    so force closure holds exactly when mu >= tan(theta):

      A1  score 0.9 on object A (tan = 0.3)  -> mu* = 0.4
      B1  score 0.8 on object B (tan = 0.9)  -> mu* = 1.0
      B2  score 0.7, rotated 180deg about z and shifted +4mm along y: object
          B's far contact lands at gripper-frame y = 0.022, inside the
          (0.02, 0.03) right-finger slab                   -> collision, -1
      B2's rotation also keeps it outside the protocol NMS's rotation
          threshold, so it survives to the scoring stage.
      A2  score 0.6, centered 50 mm from object A (beyond the 30 mm NMS
          translation threshold, assigned to A by nearest-point): no points
          between the jaws                                 -> empty, -1

    All four survive per-object top-10 and the top-50 min-score cut, so the
    scored list in dump order is [0.4, 1.0, -1, -1] and every accuracy cell
    follows the k+1 protocol formula in closed form.
    """

    W, H, DEP = 0.04, 0.02, 0.04

    @staticmethod
    def _object(tan_theta):
        inner = []
        for i in range(1, 7):
            p = np.array([0.004, 0.002 * i, 0.0], np.float32)
            inner += [p, -p]
        pts = np.stack(inner + [np.array([0.0, -0.018, 0.0], np.float32),
                                np.array([0.0, 0.018, 0.0], np.float32)])
        normals = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (14, 1))
        tilted = np.array([tan_theta, 1.0, 0.0], np.float32)
        normals[12] = tilted
        normals[13] = tilted
        return pts, normals

    def _grasp(self, center, score, rot=np.eye(3, dtype=np.float32)):
        g = np.zeros(17, np.float32)
        g[0], g[1], g[2], g[3] = score, self.W, self.H, self.DEP
        g[4:13] = np.asarray(rot, np.float32).reshape(-1)
        g[13:16] = center
        g[16] = -1
        return g

    def _scene(self):
        pts_a, n_a = self._object(0.3)
        pts_b, n_b = self._object(0.9)
        t_a = np.array([0.0, 0.0, 0.5], np.float32)
        t_b = np.array([0.3, 0.0, 0.5], np.float32)
        poses = [
            np.concatenate([np.eye(3, dtype=np.float32), t[:, None]], 1)
            for t in (t_a, t_b)
        ]
        flip_z = np.diag([-1.0, -1.0, 1.0]).astype(np.float32)
        grasps = np.stack([
            self._grasp(t_a, 0.9),
            self._grasp(t_b, 0.8),
            self._grasp(t_b + np.array([0.0, 0.004, 0.0], np.float32), 0.7,
                        rot=flip_z),
            self._grasp(t_a + np.array([0.05, 0.0, 0.0], np.float32), 0.6),
        ])
        return grasps, [pts_a, pts_b], [n_a, n_b], poses

    @staticmethod
    def _expected():
        """Hand-derived matrix for the scored list [0.4, 1.0, -1, -1]:
        cum-hits at mu in {0.2}: none; {0.4, 0.6, 0.8}: [1,1,1,1];
        {1.0, 1.2}: [1,2,2,2]; cell[k] = hits-so-far / (k+1), with the
        whole (4-long) list reused beyond k = 3 (k+1 denominator rule)."""
        exp = np.zeros((50, 6), np.float32)
        k1 = np.arange(50, dtype=np.float32) + 1.0
        for fi, mu in enumerate((0.2, 0.4, 0.6, 0.8, 1.0, 1.2)):
            if mu < 0.4:
                continue
            if mu < 1.0:
                exp[:, fi] = 1.0 / k1
            else:
                exp[0, fi] = 1.0
                exp[1:, fi] = 2.0 / k1[1:]
        return exp

    def test_whole_accuracy_matrix(self):
        grasps, clouds, normals, poses = self._scene()
        acc = eval_frame(grasps, clouds, normals, poses)
        np.testing.assert_allclose(acc, self._expected(), atol=1e-7)

    def test_summarize_matches_closed_form(self):
        grasps, clouds, normals, poses = self._scene()
        acc = eval_frame(grasps, clouds, normals, poses)
        s = summarize(acc[None])
        exp = self._expected()
        assert abs(s["AP"] - 100.0 * exp.mean()) < 1e-4
        assert abs(s["AP0.8"] - 100.0 * exp[:, 3].mean()) < 1e-4
        assert abs(s["AP0.4"] - 100.0 * exp[:, 1].mean()) < 1e-4

    def test_table_slab_flips_a1_to_collision(self):
        """A table point inside A1's right-finger volume turns the best
        grasp into a collision: scored list becomes [-1, 1.0, -1, -1]."""
        grasps, clouds, normals, poses = self._scene()
        table = np.array([[0.0, 0.025, 0.5]], np.float32)
        acc = eval_frame(grasps, clouds, normals, poses, table=table)
        exp = np.zeros((50, 6), np.float32)
        k1 = np.arange(50, dtype=np.float32) + 1.0
        for fi in (4, 5):  # only B1 (mu* = 1.0) scores
            exp[0, fi] = 0.0  # first-ranked A1 is a collision
            exp[1:, fi] = 1.0 / k1[1:]
        np.testing.assert_allclose(acc, exp, atol=1e-7)
