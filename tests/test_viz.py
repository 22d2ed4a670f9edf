"""Gripper-mesh generation and capture-inspection helper tests."""

import numpy as np
import pytest

from graspnet_tpu.postproc import GraspGroup
from graspnet_tpu.postproc.gripper import (
    DEPTH_BASE,
    FINGER_WIDTH,
    TAIL_LENGTH,
    grasp_group_meshes,
    gripper_mesh,
    save_meshes_ply,
)
from graspnet_tpu.sensors.viz import (
    colorize_depth,
    merge_segmap_into_npz,
    save_depth_png,
)


def _group(rows):
    return GraspGroup(np.asarray(rows, np.float32))


def _row(score=0.5, width=0.08, depth=0.03, R=None, t=(0.1, 0.0, 0.4)):
    R = np.eye(3) if R is None else R
    return np.concatenate(
        [[score, width, 0.02, depth], np.asarray(R).reshape(9), t, [-1.0]]
    )


class TestGripperMesh:
    def test_shapes_and_indices(self):
        v, t, c = gripper_mesh(np.zeros(3), np.eye(3), 0.08, 0.03, 0.7)
        assert v.shape == (32, 3) and t.shape == (48, 3) and c.shape == (3,)
        assert t.min() >= 0 and t.max() < 32

    def test_geometry_spans_gripper_volume(self):
        w, d = 0.08, 0.03
        v, _, _ = gripper_mesh(np.zeros(3), np.eye(3), w, d)
        # x: from tail start to finger tips
        assert v[:, 0].min() == pytest.approx(-DEPTH_BASE - FINGER_WIDTH - TAIL_LENGTH)
        assert v[:, 0].max() == pytest.approx(d)
        # y: fingers straddle +-(w/2 + finger_width)
        assert v[:, 1].min() == pytest.approx(-w / 2 - FINGER_WIDTH)
        assert v[:, 1].max() == pytest.approx(w / 2 + FINGER_WIDTH)

    def test_rigid_transform_applied(self):
        rng = np.random.default_rng(0)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = np.array([0.2, -0.1, 0.5])
        v0, _, _ = gripper_mesh(np.zeros(3), np.eye(3), 0.08, 0.03)
        v1, _, _ = gripper_mesh(t, q, 0.08, 0.03)
        np.testing.assert_allclose(v1, v0 @ q.astype(np.float32).T + t, atol=1e-5)

    def test_group_meshes_and_color_ramp(self):
        gg = _group([_row(score=0.1), _row(score=0.9)])
        meshes = grasp_group_meshes(gg)
        assert len(meshes) == 2
        # normalized: low score -> green, high -> red
        assert meshes[0][2][1] == pytest.approx(1.0)
        assert meshes[1][2][0] == pytest.approx(1.0)
        assert grasp_group_meshes(_group(np.zeros((0, 17)))) == []

    def test_save_ply(self, tmp_path):
        gg = _group([_row()])
        path = tmp_path / "grasps.ply"
        gg.save_ply(str(path))
        text = path.read_text()
        assert "element vertex 32" in text and "element face 48" in text


class TestCaptureViz:
    def test_colorize_depth(self):
        depth = np.zeros((4, 6), np.uint16)
        depth[1:, :] = np.linspace(300, 600, 18).reshape(3, 6).astype(np.uint16)
        img = colorize_depth(depth)
        assert img.shape == (4, 6, 3) and img.dtype == np.uint8
        assert (img[0] == 0).all()  # invalid row black
        assert (img[1:] != 0).any()

    def test_colorize_all_invalid(self):
        assert (colorize_depth(np.zeros((3, 3))) == 0).all()

    def test_save_depth_png(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        depth = (np.ones((5, 5)) * 500).astype(np.uint16)
        path = tmp_path / "d.png"
        save_depth_png(depth, str(path))
        assert Image.open(path).size == (5, 5)

    def test_merge_segmap(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        depth = np.full((8, 10), 500, np.uint16)
        np.savez(
            tmp_path / "cap.npz",
            rgb=np.zeros((8, 10, 3), np.uint8),
            depth=depth,
            K=np.eye(3),
        )
        seg = np.zeros((8, 10), np.uint8)
        seg[2:5, 3:7] = 255
        Image.fromarray(seg).save(tmp_path / "seg.png")
        out = merge_segmap_into_npz(
            str(tmp_path / "cap.npz"), str(tmp_path / "seg.png"), str(tmp_path / "o.npz")
        )
        assert out["segmap"].shape == (8, 10)
        assert np.load(tmp_path / "o.npz")["segmap"].sum() == seg.sum()

    def test_merge_segmap_shape_mismatch(self, tmp_path):
        pytest.importorskip("PIL")
        from PIL import Image

        np.savez(
            tmp_path / "cap.npz", depth=np.zeros((8, 10), np.uint16), K=np.eye(3)
        )
        Image.fromarray(np.zeros((4, 4), np.uint8)).save(tmp_path / "seg.png")
        with pytest.raises(ValueError, match="does not match"):
            merge_segmap_into_npz(
                str(tmp_path / "cap.npz"),
                str(tmp_path / "seg.png"),
                str(tmp_path / "o.npz"),
            )
