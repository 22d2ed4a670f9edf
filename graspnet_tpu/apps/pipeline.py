"""Single-frame grasp inference pipeline.

The shared skeleton of every reference demo/app (image_demo.py:84-273,
demo_pointcloud.py, zividtest.py, the ROS nodes): cloud -> sample -> network
-> decode -> (optional) collision filter -> sort -> NMS/top-K.  Here the
network + decode run as one jitted program; collision IoUs run on device too.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu import checkpoint
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import graspnet_forward, init_graspnet, pred_decode
from graspnet_tpu.postproc import GraspGroup, ModelFreeCollisionDetector


@dataclasses.dataclass
class PipelineTimings:
    infer_s: float = 0.0
    collision_s: float = 0.0


class GraspPipeline:
    """Loads weights once, compiles once, then serves frames."""

    def __init__(
        self,
        params: Optional[Dict[str, Any]] = None,
        cfg: GraspNetConfig = GraspNetConfig(),
        checkpoint_path: Optional[str] = None,
        seed: int = 0,
        mesh: Optional[Any] = None,
    ):
        """`mesh`: optional jax.sharding.Mesh.  Axis names select the
        sharding strategy:
          * 'data' (1-D, the default from make_mesh(n)): the raw decode
            program shards the scene batch over devices (params
            replicated) — the multi-chip eval-THROUGHPUT path
            (parallel.data_parallel_infer); batch must divide by the size.
          * 'candidate' (optionally with a 'data' axis for a hybrid 2-D
            mesh): ONE scene's stage-2 candidate sweep shards across
            devices — the multi-chip LATENCY path for robot serving
            (parallel.candidate_sharded_infer); works at batch 1, and the
            fused top-k program runs the device NMS on the gathered rows."""
        from graspnet_tpu.utils.compile_cache import enable as enable_compile_cache

        enable_compile_cache()
        self.cfg = cfg
        if params is not None:
            self.params = params
        elif checkpoint_path is not None:
            if checkpoint_path.endswith(".tar"):
                self.params = checkpoint.load_torch_checkpoint(checkpoint_path)
            else:
                template = init_graspnet(jax.random.PRNGKey(seed), cfg)
                # accept both a bare params pytree and the full train state
                # apps/train.py saves ({params, opt_state, epoch}) — the
                # reference's train.py -> test.py checkpoint flow
                # (reference test.py:58-60 loads model_state_dict out of the
                # same dict train.py:211-219 saved)
                raw = checkpoint.restore(checkpoint_path)
                if isinstance(raw, dict) and "params" in raw:
                    raw = raw["params"]
                self.params = jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(template),
                    jax.tree_util.tree_leaves(raw),
                )
        else:
            self.params = init_graspnet(jax.random.PRNGKey(seed), cfg)

        @jax.jit
        def _infer(params, cloud):
            ep = graspnet_forward(params, cloud, cfg, train=False)
            grasps, valid = pred_decode(ep, cfg)
            return grasps, valid

        @functools.partial(jax.jit, static_argnames=("top_k",))
        def _infer_topk(params, cloud, top_k=50):
            """Complete serving program: network -> decode -> NMS -> top-K.

            Only (B, K, 17) rows leave the chip — NMS runs on device
            (postproc.nms.nms_top_k), vmapped over frames.
            """
            from graspnet_tpu.postproc.nms import nms_top_k

            ep = graspnet_forward(params, cloud, cfg, train=False)
            grasps, valid = pred_decode(ep, cfg)
            return jax.vmap(lambda g, v: nms_top_k(g, v, k=top_k))(grasps, valid)

        # the unsharded programs always exist: a mesh-constructed pipeline
        # still serves single-frame / non-divisible batches through them
        # instead of failing GSPMD's P('data') divisibility check (ADVICE r3)
        self._infer_single = _infer
        # batch divisibility only constrains the DATA axis; a candidate-axis
        # mesh serves any batch (seeds shard, scenes don't)
        self._data_axis_size = 1
        if mesh is not None:
            names = getattr(mesh, "axis_names", ("data",))
            if "candidate" in names and mesh.shape["candidate"] > 1:
                from graspnet_tpu.parallel.candidate import candidate_sharded_infer

                data_axis = (
                    "data"
                    if ("data" in names and mesh.shape["data"] > 1)
                    else None
                )
                sharded = candidate_sharded_infer(cfg, mesh, data_axis=data_axis)
                _infer = sharded
                if data_axis is not None:
                    self._data_axis_size = mesh.shape["data"]

                @functools.partial(jax.jit, static_argnames=("top_k",))
                def _infer_topk(params, cloud, top_k=50):
                    from graspnet_tpu.postproc.nms import nms_top_k

                    grasps, valid = sharded(params, cloud)
                    return jax.vmap(lambda g, v: nms_top_k(g, v, k=top_k))(
                        grasps, valid
                    )

            else:
                from graspnet_tpu.parallel.candidate import data_parallel_infer

                _infer = data_parallel_infer(cfg, mesh)
                self._data_axis_size = mesh.devices.size
        self._infer = _infer
        self._infer_topk = _infer_topk
        self.mesh = mesh
        self.timings = PipelineTimings()

    def warmup(
        self,
        topk: Optional[bool] = None,
        collision_thresh: float = -1.0,
        nms: bool = True,
        top_k: int = 50,
        batch_size: int = 1,
    ) -> float:
        """Compile the serving program; returns compile wall time.

        Pass the SAME knobs the later run()/get_grasps* calls will use so the
        program compiled here is the one that actually serves: with
        collision_thresh <= 0, nms and top_k, run() takes the fused
        network+decode+NMS+top-K program (static in top_k); otherwise the raw
        decode program (static in batch shape).  `topk` forces the choice
        explicitly.
        """
        fused = (
            topk
            if topk is not None
            else (collision_thresh <= 0 and nms and bool(top_k))
        )
        dummy = jnp.zeros((batch_size, self.cfg.num_point, 3), jnp.float32)
        t0 = time.perf_counter()
        if fused:
            jax.block_until_ready(
                self._infer_topk(self.params, dummy, top_k=top_k or 50)
            )
        else:
            jax.block_until_ready(
                self._infer_for_batch(batch_size)(self.params, dummy)
            )
        return time.perf_counter() - t0

    def sample_cloud(
        self, cloud: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> np.ndarray:
        """Random-sample to num_point, padding with replacement when short
        (reference graspnet_dataset.py:139-144 / image_demo.py)."""
        rng = rng or np.random.default_rng(0)
        n = self.cfg.num_point
        if len(cloud) >= n:
            idxs = rng.choice(len(cloud), n, replace=False)
        else:
            idxs = np.concatenate(
                [np.arange(len(cloud)), rng.choice(len(cloud), n - len(cloud), replace=True)]
            )
        return cloud[idxs]

    def _infer_for_batch(self, b: int):
        """Sharded program when the data axis divides the batch, else
        unsharded (a candidate-axis mesh serves any batch size)."""
        if self.mesh is not None and b % self._data_axis_size != 0:
            return self._infer_single
        return self._infer

    def get_grasps(self, cloud_sampled: np.ndarray) -> GraspGroup:
        """Run the network on a (num_point, 3) cloud, return decoded grasps."""
        t0 = time.perf_counter()
        grasps, valid = self._infer_for_batch(1)(
            self.params, jnp.asarray(cloud_sampled, jnp.float32)[None]
        )
        grasps, valid = jax.device_get((grasps, valid))
        self.timings.infer_s = time.perf_counter() - t0
        return GraspGroup(grasps[0][valid[0]])

    def get_grasps_batch(self, clouds: np.ndarray) -> list:
        """Batched inference: (B, num_point, 3) -> list of B GraspGroups.

        Batching frames amortizes kernel-launch overheads — the eval sweep
        over the 190-scene test split runs ~B times fewer program dispatches.
        """
        return self.finish_grasps_batch(self.dispatch_grasps_batch(clouds))

    def dispatch_grasps_batch(self, clouds: np.ndarray):
        """Async half of get_grasps_batch: enqueue the program, return a
        handle immediately (jax async dispatch).  Lets a pipelined caller
        overlap this batch's device work + result fetch with the next
        batch's host work — apps/test.py fetches on its postproc thread."""
        refs = self._infer_for_batch(len(clouds))(
            self.params, jnp.asarray(clouds, jnp.float32)
        )
        # dispatch timestamp rides the handle so finish_grasps_batch can
        # report dispatch->results-on-host time (timings.infer_s keeps its
        # pre-split meaning even when finish runs on another thread later)
        return (refs, time.perf_counter())

    def finish_grasps_batch(self, handle) -> list:
        """Blocking half: fetch the decode refs, build per-frame groups."""
        refs, t0 = handle
        grasps, valid = jax.device_get(refs)
        self.timings.infer_s = time.perf_counter() - t0
        return [GraspGroup(g[v]) for g, v in zip(grasps, valid)]

    def collision_filter(
        self,
        gg: GraspGroup,
        scene_cloud: np.ndarray,
        collision_thresh: float = 0.01,
        voxel_size: float = 0.01,
        approach_dist: float = 0.05,
    ) -> GraspGroup:
        t0 = time.perf_counter()
        detector = ModelFreeCollisionDetector(scene_cloud, voxel_size=voxel_size)
        mask = detector.detect(
            gg, approach_dist=approach_dist, collision_thresh=collision_thresh
        )
        self.timings.collision_s = time.perf_counter() - t0
        return gg[~mask]

    def collision_filter_batch(
        self,
        ggs,
        scene_clouds,
        collision_thresh: float = 0.01,
        voxel_size: float = 0.01,
        approach_dist: float = 0.05,
        pre_downsampled: bool = False,
    ):
        """Batch-of-frames collision filter: ONE device round trip.

        Mask-identical to collision_filter per frame (parity pinned in
        tests/test_postproc.py); apps/test.py uses it so an eval batch pays
        one transfer + one fetch instead of one per frame per array.
        """
        from graspnet_tpu.postproc.collision import detect_batch

        t0 = time.perf_counter()
        masks = detect_batch(
            scene_clouds,
            ggs,
            voxel_size=voxel_size,
            approach_dist=approach_dist,
            collision_thresh=collision_thresh,
            pre_downsampled=pre_downsampled,
        )
        self.timings.collision_s = time.perf_counter() - t0
        return [gg[~m] for gg, m in zip(ggs, masks)]

    def get_grasps_topk(self, cloud_sampled: np.ndarray, top_k: int = 50) -> GraspGroup:
        """Serving fast path: NMS + top-K fused into the device program.

        Matches get_grasps() -> sort -> nms() -> [:top_k] exactly (parity
        test in tests/test_postproc.py) while shipping only (K, 17) rows.
        """
        t0 = time.perf_counter()
        rows, vmask = self._infer_topk(
            self.params, jnp.asarray(cloud_sampled, jnp.float32)[None], top_k=top_k
        )
        rows, vmask = jax.device_get((rows[0], vmask[0]))
        self.timings.infer_s = time.perf_counter() - t0
        return GraspGroup(rows[vmask])

    def run(
        self,
        cloud_sampled: np.ndarray,
        scene_cloud: Optional[np.ndarray] = None,
        collision_thresh: float = -1.0,
        nms: bool = True,
        top_k: int = 50,
        voxel_size: float = 0.01,
    ) -> GraspGroup:
        """Full frame pipeline. collision_thresh <= 0 skips the filter
        (reference README.md:72 convention: -1 disables it)."""
        if collision_thresh <= 0 and nms and top_k:
            # no collision filter between decode and NMS -> the fully fused
            # on-device program is equivalent and ships 20x less data
            return self.get_grasps_topk(cloud_sampled, top_k=top_k)
        gg = self.get_grasps(cloud_sampled)
        if collision_thresh > 0 and scene_cloud is not None:
            gg = self.collision_filter(
                gg, scene_cloud, collision_thresh, voxel_size
            )
        gg = gg.sort_by_score()
        if nms:
            gg = gg.nms()
        if top_k:
            gg = gg[: top_k]
        return gg
