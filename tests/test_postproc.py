"""Post-processing tests: collision oracle parity, NMS properties, containers."""

import numpy as np
import pytest

from graspnet_tpu.postproc import (
    Grasp,
    GraspGroup,
    ModelFreeCollisionDetector,
    grasp_nms,
    voxel_down_sample,
)
from graspnet_tpu.models.geometry import batch_viewpoint_params_to_matrix

import jax.numpy as jnp


def collision_oracle(scene_points, g, approach_dist, voxel_size, collision_thresh):
    """Numpy transcription of reference collision_detector.py:69-112."""
    approach_dist = max(approach_dist, 0.01)
    T = g[:, 13:16]
    R = g[:, 4:13].reshape(-1, 3, 3)
    heights = g[:, 2][:, None]
    depths = g[:, 3][:, None]
    widths = g[:, 1][:, None]
    targets = scene_points[None, :, :] - T[:, None, :]
    targets = np.matmul(targets, R)
    fw, fl = 0.01, 0.06
    mask1 = (targets[:, :, 2] > -heights / 2) & (targets[:, :, 2] < heights / 2)
    mask2 = (targets[:, :, 0] > depths - fl) & (targets[:, :, 0] < depths)
    mask3 = targets[:, :, 1] > -(widths / 2 + fw)
    mask4 = targets[:, :, 1] < -widths / 2
    mask5 = targets[:, :, 1] < (widths / 2 + fw)
    mask6 = targets[:, :, 1] > widths / 2
    mask7 = (targets[:, :, 0] <= depths - fl) & (targets[:, :, 0] > depths - fl - fw)
    mask8 = (targets[:, :, 0] <= depths - fl - fw) & (
        targets[:, :, 0] > depths - fl - fw - approach_dist
    )
    left = mask1 & mask2 & mask3 & mask4
    right = mask1 & mask2 & mask5 & mask6
    bottom = mask1 & mask3 & mask5 & mask7
    shifting = mask1 & mask3 & mask5 & mask8
    global_mask = left | right | bottom | shifting
    lr_vol = (heights * fl * fw / voxel_size**3).reshape(-1)
    b_vol = (heights * (widths + 2 * fw) * fw / voxel_size**3).reshape(-1)
    s_vol = (heights * (widths + 2 * fw) * approach_dist / voxel_size**3).reshape(-1)
    volume = lr_vol * 2 + b_vol + s_vol
    global_iou = global_mask.sum(axis=1) / (volume + 1e-6)
    return global_iou > collision_thresh, global_iou


def random_grasps(rng, m):
    towards = rng.normal(size=(m, 3)).astype(np.float32)
    angles = rng.uniform(0, np.pi, size=m).astype(np.float32)
    R = np.asarray(batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angles)))
    g = np.zeros((m, 17), dtype=np.float32)
    g[:, 0] = rng.uniform(0, 1, m)  # score
    g[:, 1] = rng.uniform(0.02, 0.1, m)  # width
    g[:, 2] = 0.02  # height
    g[:, 3] = rng.uniform(0.01, 0.04, m)  # depth
    g[:, 4:13] = R.reshape(m, 9)
    g[:, 13:16] = rng.uniform(-0.2, 0.2, (m, 3))
    g[:, 16] = -1
    return g


class TestCollision:
    def test_matches_oracle(self, rng):
        scene = rng.uniform(-0.3, 0.3, size=(2000, 3)).astype(np.float32)
        g = random_grasps(rng, 32)
        det = ModelFreeCollisionDetector(scene, voxel_size=0.01)
        got = det.detect(GraspGroup(g), approach_dist=0.05, collision_thresh=0.01)
        want, want_iou = collision_oracle(
            det.scene_points, g, approach_dist=0.05, voxel_size=0.01, collision_thresh=0.01
        )
        np.testing.assert_array_equal(got, want)

    def test_ious_and_empty(self, rng):
        scene = rng.uniform(-0.3, 0.3, size=(1500, 3)).astype(np.float32)
        g = random_grasps(rng, 16)
        det = ModelFreeCollisionDetector(scene, voxel_size=0.01)
        mask, empty, ious = det.detect(
            GraspGroup(g),
            approach_dist=0.05,
            collision_thresh=0.01,
            return_empty_grasp=True,
            return_ious=True,
        )
        _, want_iou = collision_oracle(det.scene_points, g, 0.05, 0.01, 0.01)
        np.testing.assert_allclose(ious[0], want_iou, rtol=1e-5)
        assert empty.shape == (16,) and empty.dtype == bool

    def test_batch_matches_per_frame(self, rng):
        """detect_batch == per-frame detect, exactly, across ragged frames.

        Frames deliberately straddle the shared-bucket boundaries (different
        cloud sizes and grasp counts, incl. an empty group), so the test
        pins that the common (B, Npad/Mpad) padding changes no mask."""
        from graspnet_tpu.postproc.collision import detect_batch

        clouds = [
            rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
            for n in (900, 2500, 4100, 1300)
        ]
        groups = [
            GraspGroup(random_grasps(rng, m)) for m in (32, 300, 0, 7)
        ]
        got = detect_batch(
            clouds, groups,
            voxel_size=0.01, approach_dist=0.05, collision_thresh=0.01,
        )
        assert len(got) == 4
        for cloud, gg, mask in zip(clouds, groups, got):
            det = ModelFreeCollisionDetector(cloud, voxel_size=0.01)
            want = det.detect(gg, approach_dist=0.05, collision_thresh=0.01)
            np.testing.assert_array_equal(mask, want)

    def test_batch_all_empty_and_empty_list(self, rng):
        from graspnet_tpu.postproc.collision import detect_batch

        clouds = [rng.uniform(-0.3, 0.3, (500, 3)).astype(np.float32)] * 2
        groups = [GraspGroup(np.zeros((0, 17), np.float32))] * 2
        masks = detect_batch(clouds, groups, voxel_size=0.01)
        assert [m.shape for m in masks] == [(0,), (0,)]
        assert detect_batch([], [], voxel_size=0.01) == []


class TestVoxel:
    def test_centroids(self):
        pts = np.array(
            [[0.0, 0.0, 0.0], [0.001, 0.001, 0.001], [0.1, 0.1, 0.1]], np.float32
        )
        out = voxel_down_sample(pts, 0.01)
        assert out.shape == (2, 3)
        # the two close points average
        d = np.linalg.norm(out - np.array([0.0005, 0.0005, 0.0005]), axis=1)
        assert d.min() < 1e-6

    def test_reduces_density(self, rng):
        pts = rng.uniform(0, 0.1, size=(5000, 3)).astype(np.float32)
        out = voxel_down_sample(pts, 0.02)
        assert 0 < len(out) <= 6**3


class TestNMS:
    def test_keeps_best_suppresses_near(self, rng):
        g = random_grasps(rng, 8)
        # make grasps 0 and 1 nearly identical, 0 stronger
        g[1] = g[0]
        g[1, 0] = g[0, 0] - 0.1
        g[1, 13] += 0.001
        keep = grasp_nms(g, translation_thresh=0.03, rotation_thresh=0.5)
        assert 0 in keep and 1 not in keep

    def test_distant_kept(self, rng):
        g = random_grasps(rng, 2)
        g[1, 13:16] = g[0, 13:16] + 1.0  # far away
        keep = grasp_nms(g)
        assert len(keep) == 2

    def test_descending_scores(self, rng):
        g = random_grasps(rng, 50)
        keep = grasp_nms(g)
        kept_scores = g[keep, 0]
        assert np.all(np.diff(kept_scores) <= 1e-7)


class TestContainers:
    def test_grasp_group_fields(self, rng):
        g = random_grasps(rng, 10)
        gg = GraspGroup(g)
        assert len(gg) == 10
        np.testing.assert_array_equal(gg.scores, g[:, 0])
        np.testing.assert_array_equal(gg.translations, g[:, 13:16])
        assert gg.rotation_matrices.shape == (10, 3, 3)
        top = gg.sort_by_score()
        assert np.all(np.diff(top.scores) <= 1e-7)
        sub = gg[np.array([1, 3, 5])]
        assert len(sub) == 3
        single = gg[0]
        assert isinstance(single, Grasp)
        T = single.to_matrix()
        np.testing.assert_array_equal(T[:3, 3], g[0, 13:16])

    def test_grasp_field_setters(self, rng):
        g = random_grasps(rng, 3)
        grasp = Grasp(g[0].copy())
        grasp.score = 0.5
        grasp.width = 0.08
        grasp.object_id = 7
        grasp.translation = [1.0, 2.0, 3.0]
        grasp.rotation_matrix = np.eye(3)
        assert grasp.score == 0.5 and grasp.width == np.float32(0.08)
        assert grasp.object_id == 7
        np.testing.assert_array_equal(grasp.translation, [1.0, 2.0, 3.0])
        np.testing.assert_array_equal(grasp.rotation_matrix, np.eye(3))

    def test_transform_group_matches_per_grasp(self, rng):
        g = random_grasps(rng, 6)
        T = np.eye(4, dtype=np.float32)
        # rigid transform: rotate 90 deg about z + translate
        T[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        T[:3, 3] = [0.1, -0.2, 0.3]
        gg = GraspGroup(g.copy()).transform(T)
        for i in range(6):
            single = Grasp(g[i].copy()).transform(T)
            np.testing.assert_allclose(
                gg[i].grasp_array, single.grasp_array, rtol=1e-6, atol=1e-6
            )
        # composing with the reference 4x4 contract: to_matrix() commutes
        np.testing.assert_allclose(
            gg[0].to_matrix(), T @ Grasp(g[0]).to_matrix(), atol=1e-6
        )

    def test_remove_and_iteration(self, rng):
        g = random_grasps(rng, 5)
        gg = GraspGroup(g.copy())
        gg.remove(2)
        assert len(gg) == 4
        np.testing.assert_array_equal(
            gg.grasp_group_array, np.delete(g, 2, axis=0)
        )
        # reference apps iterate GraspGroup directly (demo.py:375)
        seen = [grasp.score for grasp in gg]
        np.testing.assert_allclose(seen, gg.scores)

    def test_single_grasp_mesh(self, rng):
        g = random_grasps(rng, 1)
        vertices, triangles, color = Grasp(g[0]).mesh()
        assert vertices.ndim == 2 and vertices.shape[1] == 3
        assert triangles.ndim == 2 and triangles.shape[1] == 3
        assert triangles.max() < len(vertices)
        assert color.shape == (3,)

    def test_numpy_integer_indexing(self, rng):
        # np.argmax/np.argsort produce np.integer — must yield a Grasp,
        # like a builtin int (the natural "pick the best grasp" idiom)
        g = random_grasps(rng, 5)
        gg = GraspGroup(g)
        best = gg[np.argmax(gg.scores)]
        assert isinstance(best, Grasp)
        assert best.score == gg.scores.max()

    def test_mesh_color_consistency(self, rng):
        # per-grasp and group rendering agree when normalization is off /
        # when the normalized value is passed through explicitly
        g = random_grasps(rng, 3)
        gg = GraspGroup(g)
        raw = gg.meshes(normalize_scores=False)
        for i in range(len(gg)):
            v, t, c = gg[i].mesh()
            np.testing.assert_array_equal(c, raw[i][2])
        norm = gg.meshes()
        s = gg.scores
        ns = (s - s.min()) / (s.max() - s.min())
        for i in range(len(gg)):
            v, t, c = gg[i].mesh(color_score=float(ns[i]))
            np.testing.assert_allclose(c, norm[i][2], atol=1e-6)

    def test_npy_roundtrip(self, rng, tmp_path):
        g = random_grasps(rng, 5)
        gg = GraspGroup(g)
        path = str(tmp_path / "gg.npy")
        gg.save_npy(path)
        back = GraspGroup.from_npy(path)
        np.testing.assert_array_equal(back.grasp_group_array, g)


def test_device_nms_matches_host(rng):
    """nms_top_k (jitted) == GraspGroup.nms() + top-K on the host."""
    import jax
    import jax.numpy as jnp
    from graspnet_tpu.postproc.grasp import GraspGroup
    from graspnet_tpu.postproc.nms import nms_top_k

    m = 257
    arr = np.zeros((m, 17), np.float32)
    arr[:, 0] = rng.uniform(0, 1, m)
    arr[:, 13:16] = rng.uniform(-0.1, 0.1, (m, 3))
    arr[:, 4:13] = np.linalg.qr(rng.normal(size=(m, 3, 3)))[0].reshape(m, 9)
    valid = rng.random(m) < 0.8

    k = 20
    rows, vmask = jax.jit(lambda g, v: nms_top_k(g, v, k=k))(
        jnp.asarray(arr), jnp.asarray(valid)
    )
    rows, vmask = np.asarray(rows), np.asarray(vmask)

    gg = GraspGroup(arr[valid]).sort_by_score().nms()[:k]
    want = gg.grasp_group_array
    nk = min(len(want), k)
    assert vmask[:nk].all() and not vmask[nk:].any()
    np.testing.assert_allclose(rows[:nk], want[:nk], rtol=0, atol=0)


def test_device_nms_deep_suppression_chain(rng):
    """Adversarial chain: each grasp suppresses the next — the Jacobi-sweep
    solver must still reproduce exact greedy (alternating keep pattern)."""
    import jax
    import jax.numpy as jnp
    from graspnet_tpu.postproc.nms import nms_keep_mask

    m = 64
    arr = np.zeros((m, 17), np.float32)
    arr[:, 0] = np.linspace(1.0, 0.1, m)  # strictly decreasing scores
    arr[:, 13] = np.arange(m) * 0.02  # 2 cm apart: within 3 cm of neighbors
    arr[:, 4:13] = np.tile(np.eye(3).reshape(9), (m, 1))
    keep = np.asarray(
        jax.jit(nms_keep_mask)(jnp.asarray(arr), jnp.ones(m, bool))
    )
    # neighbor suppression only (2cm < 3cm but 4cm > 3cm) -> keep every other
    assert keep[::2].all() and not keep[1::2].any()


def test_device_nms_nan_scores_match_host(rng):
    """A NaN-scored grasp sorts last (numpy argsort semantics) and must be
    suppressible by kept neighbors — and must never displace real grasps
    from the top-K slots."""
    import jax
    import jax.numpy as jnp
    from graspnet_tpu.postproc.nms import grasp_nms, nms_keep_mask, nms_top_k

    arr = np.zeros((4, 17), np.float32)
    arr[:, 0] = [0.9, np.nan, 0.5, 0.7]
    arr[:, 4:13] = np.tile(np.eye(3).reshape(9), (4, 1))
    arr[:3, 13] = 0.0  # rows 0-2 co-located; row 3 far away
    arr[3, 13] = 1.0

    keep = np.asarray(
        jax.jit(nms_keep_mask)(jnp.asarray(arr), jnp.ones(4, bool))
    )
    host_keep = np.zeros(4, bool)
    host_keep[grasp_nms(arr)] = True
    np.testing.assert_array_equal(keep, host_keep)  # [T, F, F, T]

    rows, vmask = jax.jit(lambda g, v: nms_top_k(g, v, k=3))(
        jnp.asarray(arr), jnp.ones(4, bool)
    )
    rows, vmask = np.asarray(rows), np.asarray(vmask)
    assert vmask[:2].all() and not vmask[2:].any()
    np.testing.assert_array_equal(rows[:2, 0], arr[[0, 3], 0])


def test_blocked_collision_matches_dense(rng):
    """collision_counts_blocked == collision_ious incl. padding behavior."""
    import jax.numpy as jnp
    from graspnet_tpu.postproc.collision import (
        collision_counts_blocked,
        collision_ious,
    )

    n, m = 700, 37
    pts = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    t = rng.uniform(-0.25, 0.25, (m, 3)).astype(np.float32)
    r = np.linalg.qr(rng.normal(size=(m, 3, 3)))[0].astype(np.float32)
    h = np.full(m, 0.02, np.float32)
    d = rng.choice([0.01, 0.02, 0.03, 0.04], m).astype(np.float32)
    w = rng.uniform(0.01, 0.1, m).astype(np.float32)

    want = collision_ious(
        jnp.asarray(pts), jnp.asarray(t), jnp.asarray(r),
        jnp.asarray(h), jnp.asarray(d), jnp.asarray(w),
        approach_dist=0.05, voxel_size=0.01,
    )
    # pad scene with sentinels like the detector does
    pts_p = np.full((1024, 3), 1e9, np.float32)
    pts_p[:n] = pts
    got = collision_counts_blocked(
        jnp.asarray(pts_p), jnp.asarray(t), jnp.asarray(r),
        jnp.asarray(h), jnp.asarray(d), jnp.asarray(w),
        approach_dist=0.05, voxel_size=0.01, block=256,
    )
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_collision_detector_bucketing_no_shape_explosion(rng):
    """Different M values within a bucket reuse one compiled program."""
    from graspnet_tpu.postproc.collision import ModelFreeCollisionDetector
    from graspnet_tpu.postproc.grasp import GraspGroup

    scene = rng.uniform(-0.3, 0.3, (5000, 3)).astype(np.float32)
    det = ModelFreeCollisionDetector(scene, voxel_size=0.01)
    for m in (3, 60, 255):
        arr = np.zeros((m, 17), np.float32)
        arr[:, 0] = rng.uniform(0, 1, m)
        arr[:, 1] = 0.05
        arr[:, 2] = 0.02
        arr[:, 3] = 0.02
        arr[:, 4:13] = np.linalg.qr(rng.normal(size=(m, 3, 3)))[0].reshape(m, 9)
        arr[:, 13:16] = rng.uniform(-0.25, 0.25, (m, 3))
        mask = det.detect(GraspGroup(arr), collision_thresh=0.01)
        assert mask.shape == (m,)
    # zero-grasp edge case
    assert det.detect(GraspGroup(np.zeros((0, 17), np.float32))).shape == (0,)


@pytest.mark.slow
def test_device_nms_fuzz_many_seeds(rng):
    """Randomized host/device NMS agreement across densities and sizes."""
    import jax
    import jax.numpy as jnp
    from graspnet_tpu.postproc.nms import grasp_nms, nms_keep_mask

    for seed in range(8):
        r = np.random.default_rng(seed)
        m = int(r.integers(2, 96))
        arr = np.zeros((m, 17), np.float32)
        arr[:, 0] = r.uniform(0, 1, m)
        # duplicate scores to exercise index tie-breaks
        if m > 4:
            arr[1, 0] = arr[0, 0]
            arr[3, 0] = arr[2, 0]
        scale = r.choice([0.01, 0.05, 0.2])  # dense -> sparse scenes
        arr[:, 13:16] = r.uniform(-scale, scale, (m, 3))
        arr[:, 4:13] = np.linalg.qr(r.normal(size=(m, 3, 3)))[0].reshape(m, 9)
        valid = r.random(m) < 0.85
        keep = np.asarray(
            jax.jit(nms_keep_mask)(jnp.asarray(arr), jnp.asarray(valid))
        )
        sub = grasp_nms(arr[valid])
        want = np.zeros(m, bool)
        want[np.nonzero(valid)[0][sub]] = True
        np.testing.assert_array_equal(keep, want, err_msg=f"seed={seed} m={m}")
