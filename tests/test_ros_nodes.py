"""Stub-rclpy smoke tests for the ROS 2 node wrappers.

rclpy is not installable here, so a fake rclpy / tf2_ros / message_filters /
std_srvs / sensor_msgs / geometry_msgs module graph is injected into
sys.modules and the REAL node code (apps/service.py run_ros_node /
run_ros_consumer_node — the re-implementations of reference demo.py:281-338
and grasp_service.py:65-164) is driven through one trigger round-trip and
one synchronized-callback cycle.  The published `estimated_grasp` TF is
checked against the core GraspService.compute output, and the consumer's
2-second rate limit is exercised with a controllable fake clock.
"""

import json
import sys
import types

import numpy as np
import pytest

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.apps import service as service_mod
from graspnet_tpu.apps.service import GraspService, ServiceConfig
from graspnet_tpu.utils.transforms import quaternion_to_matrix


# ------------------------------------------------------- fake ROS modules --


class _FakeTime:
    def __init__(self, ns=0):
        self.nanoseconds = int(ns)

    def __sub__(self, other):
        return _FakeTime(self.nanoseconds - other.nanoseconds)

    def to_msg(self):
        return types.SimpleNamespace(
            sec=self.nanoseconds // 10**9, nanosec=self.nanoseconds % 10**9
        )


class _FakeClock:
    def __init__(self):
        self.ns = 0

    def now(self):
        return _FakeTime(self.ns)


class _FakeLogger:
    def __init__(self):
        self.infos, self.warns, self.errors = [], [], []

    def info(self, m):
        self.infos.append(str(m))

    def warn(self, m):
        self.warns.append(str(m))

    def error(self, m):
        self.errors.append(str(m))


class _FakeNode:
    def __init__(self, name):
        self.node_name = name
        self._clock = _FakeClock()
        self._logger = _FakeLogger()
        self.services = []

    def create_service(self, srv_type, name, cb):
        svc = types.SimpleNamespace(srv_type=srv_type, name=name, callback=cb)
        self.services.append(svc)
        return svc

    def get_clock(self):
        return self._clock

    def get_logger(self):
        return self._logger

    def destroy_node(self):
        pass


class _FakeBroadcaster:
    sent = []  # class-level so tests can read after the node is destroyed

    def __init__(self, node):
        self.node = node

    def sendTransform(self, t):
        _FakeBroadcaster.sent.append(t)


def _vec_ns(**kw):
    return types.SimpleNamespace(**kw)


class _TransformStamped:
    def __init__(self):
        self.header = _vec_ns(stamp=None, frame_id="")
        self.child_frame_id = ""
        self.transform = _vec_ns(
            translation=_vec_ns(x=0.0, y=0.0, z=0.0),
            rotation=_vec_ns(x=0.0, y=0.0, z=0.0, w=1.0),
        )


class _Trigger:
    class Request:
        pass

    class Response:
        def __init__(self):
            self.success = False
            self.message = ""


class _FakeBuffer:
    def lookup_transform(self, target, source, when):
        # identity world<-camera rotation
        return types.SimpleNamespace(
            transform=_vec_ns(rotation=_vec_ns(x=0.0, y=0.0, z=0.0, w=1.0))
        )


class _FakeSubscriber:
    def __init__(self, node, msg_type, topic):
        self.node, self.msg_type, self.topic = node, msg_type, topic


class _FakeSynchronizer:
    def __init__(self, subs, queue_size, slop):
        self.subs, self.queue_size, self.slop = subs, queue_size, slop
        self.callbacks = []

    def registerCallback(self, cb):
        self.callbacks.append(cb)


@pytest.fixture
def ros_stubs(monkeypatch):
    """Install the fake module graph; returns the rclpy stub whose
    spin_hook the test sets to drive the node exactly once."""
    _FakeBroadcaster.sent = []

    rclpy = types.ModuleType("rclpy")
    rclpy.calls = []
    rclpy.spin_hook = None
    rclpy.init = lambda *a, **k: rclpy.calls.append("init")
    rclpy.shutdown = lambda *a, **k: rclpy.calls.append("shutdown")

    def spin(node):
        rclpy.calls.append("spin")
        if rclpy.spin_hook is not None:
            rclpy.spin_hook(node)

    rclpy.spin = spin

    rclpy_node = types.ModuleType("rclpy.node")
    rclpy_node.Node = _FakeNode
    rclpy.node = rclpy_node
    rclpy_time = types.ModuleType("rclpy.time")
    rclpy_time.Time = _FakeTime
    rclpy.time = rclpy_time

    std_srvs = types.ModuleType("std_srvs")
    std_srvs_srv = types.ModuleType("std_srvs.srv")
    std_srvs_srv.Trigger = _Trigger
    std_srvs.srv = std_srvs_srv

    tf2_ros = types.ModuleType("tf2_ros")
    tf2_ros.TransformBroadcaster = _FakeBroadcaster
    tf2_ros.Buffer = _FakeBuffer
    tf2_ros.TransformListener = lambda buf, node: None

    message_filters = types.ModuleType("message_filters")
    message_filters.Subscriber = _FakeSubscriber
    message_filters.ApproximateTimeSynchronizer = _FakeSynchronizer

    sensor_msgs = types.ModuleType("sensor_msgs")
    sensor_msgs_msg = types.ModuleType("sensor_msgs.msg")
    sensor_msgs_msg.CameraInfo = type("CameraInfo", (), {})
    sensor_msgs_msg.Image = type("Image", (), {})
    sensor_msgs_msg.PointCloud2 = type("PointCloud2", (), {})
    sensor_msgs.msg = sensor_msgs_msg

    geometry_msgs = types.ModuleType("geometry_msgs")
    geometry_msgs_msg = types.ModuleType("geometry_msgs.msg")
    geometry_msgs_msg.TransformStamped = _TransformStamped
    geometry_msgs.msg = geometry_msgs_msg

    for name, mod in {
        "rclpy": rclpy,
        "rclpy.node": rclpy_node,
        "rclpy.time": rclpy_time,
        "std_srvs": std_srvs,
        "std_srvs.srv": std_srvs_srv,
        "tf2_ros": tf2_ros,
        "message_filters": message_filters,
        "sensor_msgs": sensor_msgs,
        "sensor_msgs.msg": sensor_msgs_msg,
        "geometry_msgs": geometry_msgs,
        "geometry_msgs.msg": geometry_msgs_msg,
    }.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return rclpy


# ------------------------------------------------------------ fixtures ----


@pytest.fixture(scope="module")
def node_service():
    """One tiny GraspService shared by both node tests (pipeline compile is
    the expensive part)."""
    return GraspService(
        ServiceConfig(
            model_cfg=GraspNetConfig.tiny(),
            depth_min=0.0,
            depth_max=10.0,
            collision_thresh=-1,
            seg_proximity_thresh=1.0,
            max_world_z_for_approach=10.0,
        )
    )


@pytest.fixture
def shared_service(monkeypatch, node_service):
    """Make the node constructors reuse the compiled tiny service."""
    monkeypatch.setattr(
        service_mod, "GraspService", lambda cfg: node_service
    )
    return node_service


class _FakeRealsense:
    """Synthetic D435: flat-ish depth plane at ~0.5 m."""

    def __init__(self, *a, **k):
        self.connected = False

    def connect(self):
        self.connected = True

    def disconnect(self):
        self.connected = False

    def get_rgbd(self):
        rng = np.random.default_rng(3)
        h = w = 48
        depth = (0.45 + 0.1 * rng.random((h, w))).astype(np.float32)
        rgb = np.zeros((h, w, 3), np.uint8)
        return rgb, depth

    def camera_k(self):
        return np.array(
            [[40.0, 0.0, 24.0], [0.0, 40.0, 24.0], [0.0, 0.0, 1.0]], np.float32
        )


def _assert_tf_matches(t, tf_pose):
    assert t.child_frame_id == "estimated_grasp"
    np.testing.assert_allclose(
        [t.transform.translation.x, t.transform.translation.y, t.transform.translation.z],
        tf_pose[:3, 3],
        atol=1e-6,
    )
    r = quaternion_to_matrix(
        [t.transform.rotation.x, t.transform.rotation.y,
         t.transform.rotation.z, t.transform.rotation.w]
    )
    # quaternion round-trip of the published rotation
    np.testing.assert_allclose(r, tf_pose[:3, :3], atol=1e-5)


# --------------------------------------------------------------- tests ----


class TestTriggerNode:
    def test_trigger_round_trip(self, ros_stubs, shared_service, monkeypatch):
        from graspnet_tpu.sensors import cameras as cameras_mod

        monkeypatch.setattr(cameras_mod, "CameraRealsense", _FakeRealsense)
        captured = {}

        def drive(node):
            captured["node"] = node
            assert node.services[0].name == "trigger_grasp_calculation"
            resp = node.services[0].callback(
                _Trigger.Request(), _Trigger.Response()
            )
            captured["resp"] = resp

        ros_stubs.spin_hook = drive
        service_mod.run_ros_node(shared_service.cfg)

        assert ros_stubs.calls == ["init", "spin", "shutdown"]
        resp = captured["resp"]
        assert resp.success, resp.message
        out = json.loads(resp.message)
        assert out["ok"] and out["num_grasps"] > 0
        # camera released after the request (reference demo.py:412)
        assert not captured["node"].camera.connected
        assert len(_FakeBroadcaster.sent) == 1
        _assert_tf_matches(
            _FakeBroadcaster.sent[0], np.asarray(out["tf_pose"])
        )

    def test_trigger_failure_is_reported_not_raised(
        self, ros_stubs, shared_service, monkeypatch
    ):
        from graspnet_tpu.sensors import cameras as cameras_mod

        class Broken(_FakeRealsense):
            def get_rgbd(self):
                raise RuntimeError("no frames within 5s")

        monkeypatch.setattr(cameras_mod, "CameraRealsense", Broken)
        captured = {}

        def drive(node):
            captured["resp"] = node.services[0].callback(
                _Trigger.Request(), _Trigger.Response()
            )

        ros_stubs.spin_hook = drive
        service_mod.run_ros_node(shared_service.cfg)
        assert not captured["resp"].success
        assert "no frames" in captured["resp"].message
        assert _FakeBroadcaster.sent == []


def _cloud_msgs(n=3000):
    """PointCloud2 + full mask Image + CameraInfo for a synthetic scene."""
    rng = np.random.default_rng(7)
    cloud = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    cloud[:, 2] += 0.5
    pcd = types.SimpleNamespace(
        data=cloud.tobytes(),
        point_step=12,
        height=1,
        width=n,
        row_step=12 * n,
        is_bigendian=False,
        fields=[
            types.SimpleNamespace(name=c, offset=4 * i, datatype=7, count=1)
            for i, c in enumerate("xyz")
        ],
    )
    h = w = 64
    mask = types.SimpleNamespace(
        encoding="mono8",
        height=h,
        width=w,
        step=w,
        data=np.full((h, w), 255, np.uint8).tobytes(),
    )
    info = types.SimpleNamespace(
        k=[40.0, 0.0, 32.0, 0.0, 40.0, 32.0, 0.0, 0.0, 1.0]
    )
    return cloud, pcd, mask, info


class TestConsumerNode:
    def test_synchronized_callback_cycle(self, ros_stubs, shared_service):
        _, pcd, mask, info = _cloud_msgs()
        captured = {}

        def drive(node):
            captured["node"] = node
            assert [s.topic for s in node.ts.subs] == [
                "/perception/points", "/perception/mask",
                "/perception/camera_info",
            ]
            cb = node.ts.callbacks[0]
            cb(pcd, mask, info)  # runs the pipeline, publishes TF
            cb(pcd, mask, info)  # < 2 s later: rate-limited, skipped
            node.get_clock().ns += int(5e9)
            cb(pcd, mask, info)  # allowed again

        ros_stubs.spin_hook = drive
        service_mod.run_ros_consumer_node(shared_service.cfg)

        node = captured["node"]
        assert node._logger.errors == []
        assert any("too quickly" in wmsg for wmsg in node._logger.warns)
        assert len(_FakeBroadcaster.sent) == 2

    def test_tf_matches_core_pipeline(self, ros_stubs, shared_service):
        cloud, pcd, mask, info = _cloud_msgs()

        def drive(node):
            node.ts.callbacks[0](pcd, mask, info)

        ros_stubs.spin_hook = drive
        service_mod.run_ros_consumer_node(shared_service.cfg)
        assert len(_FakeBroadcaster.sent) == 1

        # same request through the core directly (identity world transform,
        # full-mask segmentation keeps every point near the cloud)
        k = info.k
        mask_img = np.full((mask.height, mask.width), 255, np.uint8)
        mask_pts = service_mod.segment_cloud_by_mask(
            cloud, mask_img, (k[0], k[4], k[2], k[5])
        )
        out = shared_service.compute(
            cloud, mask_points=mask_pts, world_from_camera=np.eye(4, dtype=np.float32)
        )
        assert out["ok"]
        _assert_tf_matches(
            _FakeBroadcaster.sent[0], np.asarray(out["tf_pose"])
        )

    def test_bad_mask_encoding_skips_frame(self, ros_stubs, shared_service):
        _, pcd, mask, info = _cloud_msgs()
        mask.encoding = "rgb8"

        def drive(node):
            node.ts.callbacks[0](pcd, mask, info)

        ros_stubs.spin_hook = drive
        service_mod.run_ros_consumer_node(shared_service.cfg)
        assert _FakeBroadcaster.sent == []


def test_service_candidate_devices_mesh():
    """GraspService with candidate_devices > 1 builds the candidate-axis
    latency mesh and still serves a frame end to end (virtual devices)."""
    import numpy as np

    from graspnet_tpu.apps.service import GraspService, ServiceConfig
    from graspnet_tpu.config import GraspNetConfig

    cfg = ServiceConfig(
        model_cfg=GraspNetConfig.tiny(),
        num_point=GraspNetConfig.tiny().num_point,
        collision_thresh=-1.0,
        candidate_devices=8,
    )
    svc = GraspService(cfg)
    assert svc.pipe.mesh is not None
    assert dict(svc.pipe.mesh.shape) == {"candidate": 8}
    rng = np.random.default_rng(0)
    cloud = np.stack(
        [
            rng.uniform(-0.2, 0.2, 4000),
            rng.uniform(-0.2, 0.2, 4000),
            rng.uniform(0.35, 0.55, 4000),  # inside the service depth gate
        ],
        axis=1,
    ).astype(np.float32)
    result = svc.compute(cloud)
    assert isinstance(result, dict) and "ok" in result
    if result["ok"]:
        assert "best_pose" in result
