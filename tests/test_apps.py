"""App-layer tests: pipeline, service core + TCP wrapper, transforms, IO."""

import json
import socket

import jax
import numpy as np
import pytest

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.apps.pipeline import GraspPipeline
from graspnet_tpu.apps.service import GraspService, ServiceConfig, serve_tcp
from graspnet_tpu.apps.demo_pointcloud import load_cloud
from graspnet_tpu.apps.stereo_demo import deproject_masked_points
from graspnet_tpu.sensors.cameras import FileCamera, load_intrinsics_txt, save_capture
from graspnet_tpu.utils.transforms import (
    compose_base_grasp,
    matrix_to_quaternion,
    quaternion_to_matrix,
)


@pytest.fixture(scope="module")
def tiny_service():
    cfg = GraspNetConfig.tiny()
    return GraspService(
        ServiceConfig(model_cfg=cfg, depth_min=0.0, depth_max=10.0, collision_thresh=-1)
    )


def scene_cloud(rng, n=3000):
    cloud = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    cloud[:, 2] += 0.5
    return cloud


class TestPipeline:
    @pytest.mark.slow
    def test_run_returns_grasps(self, rng):
        cfg = GraspNetConfig.tiny()
        pipe = GraspPipeline(cfg=cfg, seed=0)
        cloud = scene_cloud(rng)
        sampled = pipe.sample_cloud(cloud)
        gg = pipe.run(sampled, scene_cloud=cloud, collision_thresh=0.01, top_k=10)
        assert len(gg) <= 10
        assert gg.grasp_group_array.shape[1] == 17

    def test_sample_pads_short_clouds(self, rng):
        cfg = GraspNetConfig.tiny()
        pipe = GraspPipeline(cfg=cfg, seed=0)
        short = rng.uniform(-0.1, 0.1, (100, 3)).astype(np.float32)
        out = pipe.sample_cloud(short)
        assert out.shape == (cfg.num_point, 3)


class TestService:
    def test_compute(self, tiny_service, rng):
        out = tiny_service.compute(scene_cloud(rng))
        assert out["ok"]
        pose = np.asarray(out["best_pose"])
        assert pose.shape == (4, 4)
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)

    def test_depth_filter_rejects_empty(self, tiny_service, rng):
        far = rng.uniform(20, 30, (500, 3)).astype(np.float32)
        out = tiny_service.compute(far)
        assert not out["ok"]

    def test_mask_proximity_filter(self, tiny_service, rng):
        cloud = scene_cloud(rng)
        out_all = tiny_service.compute(cloud)
        # mask far from everything kills all grasps
        mask_pts = np.full((5, 3), 100.0, dtype=np.float32)
        out_none = tiny_service.compute(cloud, mask_points=mask_pts)
        assert out_all["ok"] and not out_none["ok"]

    def test_world_approach_filter(self, tiny_service, rng):
        gg_cfg = tiny_service.cfg
        gg_cfg.max_world_z_for_approach = -2.0  # impossible: rejects everything
        out = tiny_service.compute(
            scene_cloud(rng), world_from_camera=np.eye(4, dtype=np.float32)
        )
        gg_cfg.max_world_z_for_approach = None
        assert not out["ok"]

    def test_tcp_roundtrip(self, tiny_service, rng):
        srv = serve_tcp(tiny_service, port=0)
        port = srv.server_address[1]
        cloud = scene_cloud(rng, n=1500)
        req = json.dumps({"cloud": cloud.tolist()}).encode()
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.sendall(req)
            s.shutdown(socket.SHUT_WR)
            buf = b""
            while True:
                chunk = s.recv(65536)
                if not chunk:
                    break
                buf += chunk
        out = json.loads(buf.decode())
        assert out["ok"]
        srv.shutdown()

    def test_tcp_newline_framed_no_halfclose(self, tiny_service, rng):
        # a client that keeps the socket open while waiting for the reply
        # (no SHUT_WR) must not deadlock: newline terminates the request
        srv = serve_tcp(tiny_service, port=0)
        port = srv.server_address[1]
        cloud = scene_cloud(rng, n=1500)
        req = json.dumps({"cloud": cloud.tolist()}).encode() + b"\n"
        with socket.create_connection(("127.0.0.1", port)) as s:
            s.settimeout(120.0)
            s.sendall(req)
            f = s.makefile("rb")
            line = f.readline()
        out = json.loads(line.decode())
        assert out["ok"]
        srv.shutdown()


class TestTransforms:
    def test_quaternion_roundtrip(self, rng):
        from graspnet_tpu.models.geometry import batch_viewpoint_params_to_matrix
        import jax.numpy as jnp

        towards = rng.normal(size=(10, 3)).astype(np.float32)
        angles = rng.uniform(0, np.pi, 10).astype(np.float32)
        Rs = np.asarray(
            batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angles))
        )
        for R in Rs:
            q = matrix_to_quaternion(R)
            back = quaternion_to_matrix(q)
            np.testing.assert_allclose(back, R, atol=1e-5)

    def test_compose(self, rng):
        T1 = np.eye(4)
        T1[:3, 3] = [1, 2, 3]
        T2 = np.eye(4)
        T2[:3, 3] = [0.1, 0, 0]
        out = compose_base_grasp(T1, T2)
        np.testing.assert_allclose(out[:3, 3], [1.1, 2, 3])


class TestIO:
    def test_load_cloud_formats(self, rng, tmp_path):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        np.save(tmp_path / "c.npy", pts)
        np.savez(tmp_path / "c.npz", points=pts)
        np.testing.assert_allclose(load_cloud(str(tmp_path / "c.npy")), pts)
        np.testing.assert_allclose(load_cloud(str(tmp_path / "c.npz")), pts)

    def test_capture_roundtrip(self, rng, tmp_path):
        rgb = rng.uniform(0, 1, (24, 32, 3)).astype(np.float32)
        depth = rng.uniform(0.3, 0.8, (24, 32)).astype(np.float32)
        K = np.array([[100.0, 0, 16], [0, 100.0, 12], [0, 0, 1]])
        ts = save_capture(str(tmp_path), rgb, depth, K, timestamp=123)
        cam = FileCamera(
            str(tmp_path / f"rgb_{ts}.png"),
            str(tmp_path / f"depth_{ts}.png"),
            str(tmp_path / f"meta_{ts}.mat"),
        )
        cam.connect()
        rgb2, depth2 = cam.get_rgbd()
        np.testing.assert_allclose(cam.camera_k(), K)
        np.testing.assert_allclose(depth2, depth, atol=1e-3)
        np.testing.assert_allclose(rgb2, rgb, atol=0.01)

    def test_intrinsics_txt(self, tmp_path):
        p4 = tmp_path / "k4.txt"
        p4.write_text("100 110 32 24")
        K = load_intrinsics_txt(str(p4))
        assert K[0, 0] == 100 and K[1, 2] == 24
        p9 = tmp_path / "k9.txt"
        p9.write_text("100 0 32 0 110 24 0 0 1")
        K9 = load_intrinsics_txt(str(p9))
        np.testing.assert_allclose(K, K9)

    def test_deproject_masked(self, rng):
        depth = np.full((10, 12), 0.5, dtype=np.float32)
        mask = np.zeros((10, 12), bool)
        mask[5, 6] = True
        K = np.array([[100.0, 0, 6], [0, 100.0, 5], [0, 0, 1]])
        pts = deproject_masked_points(mask, depth, K)
        np.testing.assert_allclose(pts, [[0.0, 0.0, 0.5]], atol=1e-6)


class TestBatchedInference:
    @pytest.mark.slow
    def test_batch_matches_per_frame(self, rng):
        cfg = GraspNetConfig.tiny()
        pipe = GraspPipeline(cfg=cfg, seed=0)
        clouds = np.stack([scene_cloud(rng, cfg.num_point) for _ in range(3)])
        batched = pipe.get_grasps_batch(clouds)
        for i in range(3):
            single = pipe.get_grasps(clouds[i])
            np.testing.assert_allclose(
                batched[i].grasp_group_array, single.grasp_group_array, atol=1e-5
            )


def test_no_broken_intra_package_imports():
    """Every graspnet_tpu.* import (incl. lazy ones in optional code paths)
    must resolve to a real module."""
    import ast
    import os

    import graspnet_tpu

    pkg_root = os.path.dirname(os.path.dirname(graspnet_tpu.__file__))
    bad = []
    for root, _, files in os.walk(os.path.join(pkg_root, "graspnet_tpu")):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            tree = ast.parse(open(p).read())
            for node in ast.walk(tree):
                mods = []
                if (
                    isinstance(node, ast.ImportFrom)
                    and node.module
                    and node.module.startswith("graspnet_tpu")
                ):
                    mods.append(node.module)
                elif isinstance(node, ast.Import):
                    mods.extend(
                        a.name for a in node.names
                        if a.name.startswith("graspnet_tpu")
                    )
                for m in mods:
                    rel = m.replace(".", "/")
                    if not (
                        os.path.exists(os.path.join(pkg_root, rel + ".py"))
                        or os.path.exists(
                            os.path.join(pkg_root, rel, "__init__.py")
                        )
                    ):
                        bad.append((p, m))
    assert not bad, f"broken imports: {bad}"


def test_generate_tolerance_cli(tmp_path, monkeypatch):
    """CLI writes {obj:03d}_tolerance.npy matching the library output."""
    import sys
    import numpy as np
    from graspnet_tpu.apps import generate_tolerance as gt
    from graspnet_tpu.data.tolerance import generate_tolerance

    rng = np.random.default_rng(0)
    root = tmp_path / "ds"
    (root / "grasp_label").mkdir(parents=True)
    pts = rng.uniform(-0.03, 0.03, (24, 3)).astype(np.float32)
    scores = rng.uniform(0, 1.2, (24, 6, 3, 2)).astype(np.float32)
    np.savez(root / "grasp_label" / "000_labels.npz", points=pts, scores=scores)

    monkeypatch.setattr(
        sys, "argv",
        ["generate_tolerance", "--dataset_root", str(root), "--num_objects", "1"],
    )
    gt.main()
    out = np.load(root / "tolerance" / "000_tolerance.npy")
    want = generate_tolerance(pts, scores)
    np.testing.assert_array_equal(out, want)


@pytest.fixture(scope="module")
def tiny_pipeline():
    from graspnet_tpu.apps.pipeline import GraspPipeline
    from graspnet_tpu.config import GraspNetConfig

    return GraspPipeline(cfg=GraspNetConfig.tiny(), seed=0)


def _host_serving_path(pipe, cloud, top_k):
    """The unfused service pipeline: decode -> sort -> nms -> [:top_k]."""
    gg = pipe.get_grasps(cloud).sort_by_score().nms()
    return gg[:top_k] if top_k else gg


@pytest.mark.slow
@pytest.mark.parametrize("top_k", [1, 10, 50, 1000])
def test_pipeline_fused_topk_matches_host_path(tiny_pipeline, top_k):
    """run() fused device path == get_grasps + sort + nms + [:K] across the
    whole K range, including K=1 and K far above the post-NMS survivor count
    (the fused program pads with invalid rows that must be masked out, not
    truncated differently than the host slice — VERDICT round 1, next #9)."""
    pipe = tiny_pipeline
    rng = np.random.default_rng(3)
    cloud = rng.uniform(-0.4, 0.4, (pipe.cfg.num_point, 3)).astype(np.float32)

    fused = pipe.run(cloud, collision_thresh=-1.0, nms=True, top_k=top_k)
    host = _host_serving_path(pipe, cloud, top_k)
    assert len(fused) == len(host)
    np.testing.assert_allclose(
        fused.grasp_group_array, host.grasp_group_array, rtol=0, atol=0
    )


@pytest.mark.slow
def test_pipeline_fused_topk_empty_valid_frame(tiny_pipeline):
    """A frame where objectness rejects every seed: both pipelines must
    return an empty GraspGroup, not K rows of padding."""
    import jax.numpy as jnp
    from graspnet_tpu.apps.pipeline import GraspPipeline

    pipe = tiny_pipeline
    # bias the objectness logits (channels [:2] of approach conv3) so argmax
    # is always class 0 -> pred_decode valid mask is all-False
    params = jax.tree_util.tree_map(lambda x: x, pipe.params)
    conv3 = dict(params["approach"]["conv3"])
    bias = np.asarray(conv3["bias"]).copy()
    bias[0], bias[1] = 100.0, -100.0
    conv3["bias"] = jnp.asarray(bias)
    params["approach"] = dict(params["approach"], conv3=conv3)
    rejecting = GraspPipeline(params=params, cfg=pipe.cfg)

    rng = np.random.default_rng(5)
    cloud = rng.uniform(-0.4, 0.4, (pipe.cfg.num_point, 3)).astype(np.float32)
    fused = rejecting.run(cloud, collision_thresh=-1.0, nms=True, top_k=10)
    host = _host_serving_path(rejecting, cloud, 10)
    assert len(fused) == 0
    assert len(host) == 0


@pytest.mark.slow
def test_pipeline_fused_topk_nan_cloud_frame(tiny_pipeline):
    """A sensor frame with NaN points (real depth cameras emit them) must
    produce the SAME rows from both pipelines — NaN scores poison whole
    seeds, and the device NMS and host NMS must agree on how those rank."""
    pipe = tiny_pipeline
    rng = np.random.default_rng(7)
    cloud = rng.uniform(-0.4, 0.4, (pipe.cfg.num_point, 3)).astype(np.float32)
    cloud[:: cloud.shape[0] // 8, :] = np.nan  # ~8 NaN points spread out

    fused = pipe.run(cloud, collision_thresh=-1.0, nms=True, top_k=10)
    host = _host_serving_path(pipe, cloud, 10)
    assert len(fused) == len(host)
    np.testing.assert_array_equal(
        np.nan_to_num(fused.grasp_group_array, nan=-1e30),
        np.nan_to_num(host.grasp_group_array, nan=-1e30),
    )


def test_rotation_offsets_match_scipy(rng):
    """R_raw * R(q1) * R(q2) composition == scipy Rotation chaining
    (reference demo.py publish_modified_grasp_tf semantics)."""
    scipy_tf = pytest.importorskip("scipy.spatial.transform")
    from graspnet_tpu.utils.transforms import apply_rotation_offsets

    q1 = (0.7071068, 0.0, 0.7071068, 0.0)
    q2 = (0.0, 0.0, 0.7071068, 0.7071068)
    raw, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    pose = np.eye(4)
    pose[:3, :3] = raw
    pose[:3, 3] = [0.1, 0.2, 0.3]
    got = apply_rotation_offsets(pose, (q1, q2))
    R = scipy_tf.Rotation
    want = (R.from_matrix(raw) * R.from_quat(q1) * R.from_quat(q2)).as_matrix()
    np.testing.assert_allclose(got[:3, :3], want, atol=1e-6)
    np.testing.assert_allclose(got[:3, 3], pose[:3, 3])  # translation raw


def test_service_output_carries_tf_pose(tiny_service, rng):
    out = tiny_service.compute(scene_cloud(rng))
    assert out["ok"]
    from graspnet_tpu.utils.transforms import apply_rotation_offsets

    want = apply_rotation_offsets(
        np.asarray(out["best_pose"]), tiny_service.cfg.tf_rotation_offsets
    )
    np.testing.assert_allclose(np.asarray(out["tf_pose"]), want, atol=1e-12)


class TestRosHelpers:
    def test_pointcloud2_to_xyz_with_rgb(self, rng):
        from types import SimpleNamespace

        from graspnet_tpu.apps.service import pointcloud2_to_xyz

        n = 37
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        rgb888 = rng.integers(0, 255, (n, 3), dtype=np.uint32)
        packed = (rgb888[:, 0] << 16) | (rgb888[:, 1] << 8) | rgb888[:, 2]
        rows = np.concatenate(
            [xyz, packed.view(np.float32)[:, None].astype(np.float32, copy=False)],
            axis=1,
        ).astype(np.float32)
        rows[:, 3] = packed.astype(np.uint32).view(np.float32)
        msg = SimpleNamespace(
            data=rows.tobytes(),
            point_step=16,
            fields=[SimpleNamespace(name=c) for c in ("x", "y", "z", "rgb")],
        )
        got_xyz, got_rgb = pointcloud2_to_xyz(msg)
        np.testing.assert_array_equal(got_xyz, xyz)
        np.testing.assert_allclose(got_rgb, rgb888.astype(np.float32) / 255.0)

    def test_pointcloud2_rejects_bigendian(self, rng):
        from types import SimpleNamespace

        from graspnet_tpu.apps.service import pointcloud2_to_xyz

        msg = SimpleNamespace(
            data=np.zeros((4, 3), np.float32).tobytes(),
            point_step=12,
            is_bigendian=True,
            fields=[SimpleNamespace(name=c) for c in ("x", "y", "z")],
        )
        with pytest.raises(ValueError, match="big-endian"):
            pointcloud2_to_xyz(msg)

    def test_pointcloud2_rejects_nonfloat_xyz(self, rng):
        from types import SimpleNamespace

        from graspnet_tpu.apps.service import pointcloud2_to_xyz

        fields = [
            SimpleNamespace(name="x", datatype=7, offset=0),
            SimpleNamespace(name="y", datatype=7, offset=4),
            SimpleNamespace(name="z", datatype=4, offset=8),  # UINT16
        ]
        msg = SimpleNamespace(
            data=np.zeros((4, 3), np.float32).tobytes(), point_step=12, fields=fields
        )
        with pytest.raises(ValueError, match="datatype"):
            pointcloud2_to_xyz(msg)

    def test_pointcloud2_strips_row_padding(self, rng):
        """Organized cloud with row_step > width*point_step decodes the real
        points and drops the per-row padding bytes."""
        from types import SimpleNamespace

        from graspnet_tpu.apps.service import pointcloud2_to_xyz

        h, w = 3, 5
        xyz = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
        pad = np.full((h, 2), np.nan, np.float32)  # 8 pad bytes per row
        rows = np.concatenate([xyz.reshape(h, w * 3), pad], axis=1)
        msg = SimpleNamespace(
            data=rows.tobytes(),
            point_step=12,
            height=h,
            width=w,
            row_step=w * 12 + 8,
            fields=[SimpleNamespace(name=c) for c in ("x", "y", "z")],
        )
        got_xyz, _ = pointcloud2_to_xyz(msg)
        np.testing.assert_array_equal(got_xyz, xyz.reshape(-1, 3))
        # inconsistent layout (row_step smaller than a row) raises
        msg_bad = SimpleNamespace(
            data=rows.tobytes(), point_step=12, height=h, width=w,
            row_step=w * 12 - 4,
            fields=[SimpleNamespace(name=c) for c in ("x", "y", "z")],
        )
        with pytest.raises(ValueError, match="row_step"):
            pointcloud2_to_xyz(msg_bad)

    def test_pointcloud2_to_xyz_reordered_fields(self, rng):
        from types import SimpleNamespace

        from graspnet_tpu.apps.service import pointcloud2_to_xyz

        n = 10
        xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        rows = np.concatenate([xyz[:, 2:3], xyz[:, 0:1], xyz[:, 1:2]], axis=1)
        msg = SimpleNamespace(
            data=rows.astype(np.float32).tobytes(),
            point_step=12,
            fields=[SimpleNamespace(name=c) for c in ("z", "x", "y")],
        )
        got_xyz, got_rgb = pointcloud2_to_xyz(msg)
        np.testing.assert_array_equal(got_xyz, xyz)
        assert got_rgb is None

    def test_segment_cloud_by_mask(self):
        from graspnet_tpu.apps.service import segment_cloud_by_mask

        K = (100.0, 100.0, 6.0, 5.0)
        mask = np.zeros((10, 12), np.uint8)
        mask[5, 6] = 255  # principal-point pixel is hot
        pts = np.array(
            [
                [0.0, 0.0, 0.5],     # projects to (6, 5): kept
                [0.02, 0.0, 0.5],    # projects to (10, 5): cold pixel
                [0.0, 0.0, -0.5],    # behind the camera
                [5.0, 5.0, 0.5],     # out of bounds
            ],
            np.float32,
        )
        got = segment_cloud_by_mask(pts, mask, K)
        np.testing.assert_array_equal(got, pts[:1])
        assert segment_cloud_by_mask(np.zeros((0, 3), np.float32), mask, K) is None


def test_pointcloud2_honors_field_offsets(rng):
    """Standard padded PCL XYZRGB layout: x@0 y@4 z@8 rgb@16, step 32."""
    from types import SimpleNamespace

    from graspnet_tpu.apps.service import pointcloud2_to_xyz

    n = 11
    xyz = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    rgb888 = rng.integers(0, 255, (n, 3), dtype=np.uint32)
    packed = (rgb888[:, 0] << 16) | (rgb888[:, 1] << 8) | rgb888[:, 2]
    rows = np.zeros((n, 8), np.float32)  # 32-byte points
    rows[:, 0:3] = xyz
    rows[:, 4] = packed.astype(np.uint32).view(np.float32)
    msg = SimpleNamespace(
        data=rows.tobytes(),
        point_step=32,
        fields=[
            SimpleNamespace(name="x", offset=0),
            SimpleNamespace(name="y", offset=4),
            SimpleNamespace(name="z", offset=8),
            SimpleNamespace(name="rgb", offset=16),
        ],
    )
    got_xyz, got_rgb = pointcloud2_to_xyz(msg)
    np.testing.assert_array_equal(got_xyz, xyz)
    np.testing.assert_allclose(got_rgb, rgb888.astype(np.float32) / 255.0)


def test_empty_segmentation_rejects_all_grasps(tiny_service, rng):
    """A provided-but-empty mask means the target is not visible: the
    service must report failure, not fall back to unconstrained grasps."""
    out = tiny_service.compute(
        scene_cloud(rng), mask_points=np.zeros((0, 3), np.float32)
    )
    assert not out["ok"]
