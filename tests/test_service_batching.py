"""Micro-batched serving (apps/batching.py): parity, coalescing, errors.

The batcher must be a pure throughput optimization — concurrent requests
through it return what the per-request path returns (eval-mode BN +
row-independent kernels make frames independent of batch neighbours), and
a failed batch must surface on the callers, not kill the worker.
"""

import json
import socket
import threading

import numpy as np
import pytest

from graspnet_tpu.apps.batching import MicroBatcher, _buckets_for
from graspnet_tpu.apps.pipeline import GraspPipeline
from graspnet_tpu.apps.service import GraspService, ServiceConfig, serve_tcp
from graspnet_tpu.config import GraspNetConfig


def scene_cloud(rng, n=3000):
    cloud = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    cloud[:, 2] += 0.5
    return cloud


def test_buckets():
    assert _buckets_for(1) == [1]
    assert _buckets_for(8) == [1, 2, 4, 8]
    assert _buckets_for(6) == [1, 2, 4, 6]


@pytest.fixture(scope="module")
def pipe():
    return GraspPipeline(cfg=GraspNetConfig.tiny(), seed=0)


class TestMicroBatcher:
    def test_parity_with_per_request_path(self, pipe, rng):
        """Concurrent batched submits == pipe.run per request (the exact
        compute() semantics: decode -> collision filter -> sort -> NMS)."""
        mb = MicroBatcher(
            pipe, max_batch=4, max_wait_ms=100.0, collision_thresh=0.01
        )
        try:
            clouds = [scene_cloud(rng) for _ in range(6)]
            sampled = [pipe.sample_cloud(c) for c in clouds]
            from graspnet_tpu import native

            ds = [native.voxel_downsample(c, 0.01) for c in clouds]
            results = [None] * 6
            errs = []

            def work(i):
                try:
                    results[i] = mb.submit(sampled[i], ds[i])
                except Exception as e:  # noqa: BLE001
                    errs.append(e)

            ts = [threading.Thread(target=work, args=(i,)) for i in range(6)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert not errs
            assert mb.frames == 6
            for i in range(6):
                got = results[i].sort_by_score().nms()
                want = pipe.run(
                    sampled[i], scene_cloud=clouds[i],
                    collision_thresh=0.01, top_k=0,
                )
                np.testing.assert_allclose(
                    got.grasp_group_array,
                    want.grasp_group_array,
                    atol=1e-5,
                )
        finally:
            mb.close()

    def test_coalesces_concurrent_requests(self, pipe, rng):
        mb = MicroBatcher(pipe, max_batch=4, max_wait_ms=500.0)
        try:
            sampled = pipe.sample_cloud(scene_cloud(rng))
            ts = [
                threading.Thread(target=mb.submit, args=(sampled,))
                for _ in range(4)
            ]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            assert mb.frames == 4
            # the 500 ms window comfortably coalesces 4 local threads;
            # allow one straggler dispatch for scheduler noise
            assert mb.dispatches <= 2
        finally:
            mb.close()

    def test_error_propagates_and_worker_survives(self, pipe, rng):
        mb = MicroBatcher(pipe, max_batch=2, max_wait_ms=1.0)
        orig = pipe.dispatch_grasps_batch
        calls = {"n": 0}

        def boom(clouds):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("injected batch failure")
            return orig(clouds)

        pipe.dispatch_grasps_batch = boom
        try:
            good = pipe.sample_cloud(scene_cloud(rng))
            with pytest.raises(ValueError, match="injected"):
                mb.submit(good)
            # worker must still serve after a failed batch
            gg = mb.submit(good)
            assert gg.grasp_group_array.shape[1] == 17
        finally:
            pipe.dispatch_grasps_batch = orig
            mb.close()

    def test_finish_stage_error_propagates(self, pipe, rng):
        """A failure in the fetch/collision stage (second pipeline thread)
        must reach the caller and leave the finisher serving."""
        mb = MicroBatcher(pipe, max_batch=2, max_wait_ms=1.0)
        orig = pipe.finish_grasps_batch
        calls = {"n": 0}

        def boom(refs):
            calls["n"] += 1
            if calls["n"] == 1:
                raise ValueError("injected finish failure")
            return orig(refs)

        pipe.finish_grasps_batch = boom
        try:
            good = pipe.sample_cloud(scene_cloud(rng))
            with pytest.raises(ValueError, match="injected"):
                mb.submit(good)
            gg = mb.submit(good)
            assert gg.grasp_group_array.shape[1] == 17
        finally:
            pipe.finish_grasps_batch = orig
            mb.close()

    def test_close_rejects_new_submits(self, pipe):
        mb = MicroBatcher(pipe, max_batch=2, max_wait_ms=1.0)
        mb.close()
        with pytest.raises(RuntimeError):
            mb.submit(np.zeros((pipe.cfg.num_point, 3), np.float32))


class TestBatchedService:
    @pytest.fixture(scope="class")
    def services(self):
        cfg = GraspNetConfig.tiny()

        def mk(max_batch):
            return GraspService(
                ServiceConfig(
                    model_cfg=cfg, depth_min=0.0, depth_max=10.0,
                    collision_thresh=0.01, max_batch=max_batch,
                    batch_wait_ms=20.0,
                )
            )

        batched, plain = mk(4), mk(1)
        yield batched, plain
        batched.close()

    def test_concurrent_computes_match_plain_service(self, services, rng):
        batched, plain = services
        clouds = [scene_cloud(rng) for _ in range(5)]
        outs = [None] * 5

        def work(i):
            outs[i] = batched.compute(clouds[i])

        ts = [threading.Thread(target=work, args=(i,)) for i in range(5)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        for i in range(5):
            want = plain.compute(clouds[i])
            assert outs[i]["ok"] == want["ok"]
            np.testing.assert_allclose(
                outs[i]["best_pose"], want["best_pose"], atol=1e-5
            )
            assert outs[i]["num_grasps"] == want["num_grasps"]

    def test_data_mesh_batched_service_matches_plain(self, services, rng):
        """data_devices shards coalesced batches one-frame-per-chip (the
        multi-chip throughput deployment); results must equal the plain
        single-device service on the virtual CPU mesh."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs the virtual multi-device mesh")
        _, plain = services
        cfg = GraspNetConfig.tiny()
        svc = GraspService(
            ServiceConfig(
                model_cfg=cfg, depth_min=0.0, depth_max=10.0,
                collision_thresh=0.01, max_batch=4, data_devices=4,
                batch_wait_ms=50.0,
            )
        )
        try:
            clouds = [scene_cloud(rng) for _ in range(4)]
            outs = [None] * 4

            def work(i):
                outs[i] = svc.compute(clouds[i])

            ts = [threading.Thread(target=work, args=(i,)) for i in range(4)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            # the 50 ms window coalesces all 4 -> the sharded bucket ran
            assert svc.batcher.frames == 4
            for i in range(4):
                want = plain.compute(clouds[i])
                assert outs[i]["ok"] == want["ok"]
                np.testing.assert_allclose(
                    outs[i]["best_pose"], want["best_pose"], atol=1e-5
                )
        finally:
            svc.close()

    def test_data_devices_requires_divisible_max_batch(self):
        cfg = GraspNetConfig.tiny()
        with pytest.raises(ValueError, match="multiple"):
            GraspService(
                ServiceConfig(model_cfg=cfg, data_devices=3, max_batch=4)
            )

    def test_hybrid_data_candidate_service(self, services, rng):
        """data x candidate 2-D mesh: coalesced batches shard over 'data',
        each frame's candidate sweep over 'candidate' — results must equal
        the plain single-device service."""
        import jax

        if len(jax.devices()) < 4:
            pytest.skip("needs the virtual multi-device mesh")
        _, plain = services
        cfg = GraspNetConfig.tiny()
        svc = GraspService(
            ServiceConfig(
                model_cfg=cfg, depth_min=0.0, depth_max=10.0,
                collision_thresh=0.01, max_batch=2, data_devices=2,
                candidate_devices=2, batch_wait_ms=50.0,
            )
        )
        try:
            clouds = [scene_cloud(rng) for _ in range(2)]
            outs = [None] * 2

            def work(i):
                outs[i] = svc.compute(clouds[i])

            ts = [threading.Thread(target=work, args=(i,)) for i in range(2)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            for i in range(2):
                want = plain.compute(clouds[i])
                assert outs[i]["ok"] == want["ok"]
                np.testing.assert_allclose(
                    outs[i]["best_pose"], want["best_pose"], atol=1e-5
                )
        finally:
            svc.close()

    def test_tcp_concurrent_requests(self, services, rng):
        batched, _ = services
        srv = serve_tcp(batched, port=0)
        port = srv.server_address[1]
        outs = [None] * 3

        def req(i):
            cloud = scene_cloud(rng, n=1500)
            payload = json.dumps({"cloud": cloud.tolist()}).encode()
            with socket.create_connection(("127.0.0.1", port)) as s:
                s.sendall(payload)
                s.shutdown(socket.SHUT_WR)
                buf = b""
                while True:
                    chunk = s.recv(65536)
                    if not chunk:
                        break
                    buf += chunk
            outs[i] = json.loads(buf.decode())

        ts = [threading.Thread(target=req, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        srv.shutdown()
        assert all(o is not None and o["ok"] for o in outs)
