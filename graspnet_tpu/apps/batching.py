"""Dynamic micro-batching for the serving path.

The reference's ROS/TCP services (demo.py, grasp_service.py) handle one
request at a time: each trigger runs one full forward pass.  On TPU the
batched decode program costs nearly the same device time at batch 8 as at
batch 1 (PERF.md: the Pallas kernels iterate scenes on the sequential grid
axis, MXU stages are full-width at B=1 — so a batch of B single-frame
requests costs ~1/B the dispatch overhead and shares one host round trip).
MicroBatcher exploits that: concurrent requests coalesce, up to
``max_batch`` or until ``max_wait_ms`` passes since the first waiter, into
ONE batched decode dispatch (dispatch_grasps_batch / finish_grasps_batch,
two-stage pipelined across its own worker pair) plus ONE batched collision
call
(postproc.collision.detect_batch).

Results are bit-identical to the per-request path: eval-mode BN uses
running statistics and every kernel treats batch rows independently, so a
frame's decode does not depend on its batch neighbours (pinned by
tests/test_service_batching.py against the unbatched pipeline), and the
collision masks are pinned batch-vs-per-frame in tests/test_postproc.py.

Latency contract: a lone request waits at most ``max_wait_ms`` beyond its
own inference; under load the wait is filled by real coalescing.  Batch
shapes are bucketed to powers of two so the jit cache sees a handful of
shapes; ``warmup()`` precompiles every inference bucket plus the most
common collision bucket (see its docstring for the coverage caveat).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np


def _buckets_for(max_batch: int) -> List[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class _Item:
    __slots__ = ("sampled", "scene_ds", "future")

    def __init__(self, sampled, scene_ds):
        self.sampled = sampled
        self.scene_ds = scene_ds
        self.future: Future = Future()


class MicroBatcher:
    """Coalesces concurrent single-frame inference requests.

    Args:
      pipe: GraspPipeline (params loaded; programs compile on first use or
        via warmup()).
      max_batch: largest coalesced batch (device program bucket ceiling).
      max_wait_ms: how long the worker holds the FIRST request of a batch
        open for companions; a lone request pays at most this extra.
      collision_thresh / voxel_size / approach_dist: collision filtering of
        each request against its own (pre-downsampled) scene cloud;
        collision_thresh <= 0 disables filtering, matching the reference
        README convention.
    """

    def __init__(
        self,
        pipe,
        *,
        max_batch: int = 8,
        max_wait_ms: float = 3.0,
        collision_thresh: float = -1.0,
        voxel_size: float = 0.01,
        approach_dist: float = 0.05,
    ):
        assert max_batch >= 1
        self.pipe = pipe
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1000.0
        self.collision_thresh = float(collision_thresh)
        self.voxel_size = float(voxel_size)
        self.approach_dist = float(approach_dist)
        self.buckets = _buckets_for(self.max_batch)
        self.dispatches = 0  # batched program launches (observability)
        self.frames = 0
        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        # two-stage pipeline: the collect/dispatch thread enqueues the
        # program and hands (batch, device refs) to the finish thread,
        # which fetches + collision-filters + delivers — so batch k's
        # device time / result transfer overlap batch k+1's collection
        # and dispatch.  Backpressure bound: up to 4 batches of device
        # result buffers in flight (1 dispatching + 2 queued + 1
        # finishing).
        self._q2: "queue.Queue" = queue.Queue(maxsize=2)
        self._closed = False
        self._lock = threading.Lock()  # serializes submit-vs-close
        self._thread = threading.Thread(
            target=self._loop, name="micro-batcher", daemon=True
        )
        self._finish_thread = threading.Thread(
            target=self._finish_loop, name="micro-batcher-finish", daemon=True
        )
        self._thread.start()
        self._finish_thread.start()

    # ------------------------------------------------------------- API ----

    def warmup(self) -> float:
        """Compile the bucketed programs; returns wall seconds.

        Covers every inference bucket, plus the batched collision program
        at the full bucket for the most common grasp-row bucket (1024, the
        decode ceiling) and the 8192-point scene bucket.  Collision
        batches at other (Mpad, Npad) buckets still compile on first
        live use (the persistent compile cache makes that a one-time cost
        per shape across restarts).
        """
        import jax
        import jax.numpy as jnp

        t0 = time.perf_counter()
        for b in self.buckets:
            dummy = jnp.zeros(
                (b, self.pipe.cfg.num_point, 3), jnp.float32
            )
            jax.block_until_ready(
                self.pipe._infer_for_batch(b)(self.pipe.params, dummy)
            )
        if self.collision_thresh > 0:
            from graspnet_tpu.postproc.collision import (
                _collision_counts_rows_batch,
            )

            from graspnet_tpu.postproc.collision import FINGER_WIDTH

            pts = jnp.full((self.max_batch, 8192, 3), 1e9, jnp.float32)
            rows = jnp.zeros((self.max_batch, 1024, 17), jnp.float32)
            rows = rows.at[:, :, 4:13].set(jnp.eye(3).reshape(9))
            jax.block_until_ready(
                _collision_counts_rows_batch(
                    pts, rows,
                    # same static-arg clamp detect_batch applies
                    approach_dist=float(
                        max(self.approach_dist, FINGER_WIDTH)
                    ),
                    voxel_size=self.voxel_size,
                )
            )
        return time.perf_counter() - t0

    def submit(
        self,
        cloud_sampled: np.ndarray,
        scene_cloud_downsampled: Optional[np.ndarray] = None,
        timeout: Optional[float] = None,
    ):
        """Blocking: returns this request's (collision-filtered) GraspGroup.

        ``scene_cloud_downsampled`` must already be voxel-downsampled at
        ``voxel_size`` (callers downsample on their own request thread, so
        that host work runs in parallel across requests instead of
        serializing inside the batch worker).

        ``timeout`` (seconds) bounds the wait on the batched result; on
        expiry ``concurrent.futures.TimeoutError`` is raised and the
        request is abandoned to the worker (its slot still computes).
        """
        item = _Item(np.asarray(cloud_sampled, np.float32), scene_cloud_downsampled)
        with self._lock:  # closed-check + put must be atomic vs close()
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._q.put(item)
        return item.future.result(timeout=timeout)

    def close(self):
        """Stop the worker; pending requests still complete first."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)  # behind every accepted item (lock order)
        self._thread.join(timeout=30.0)
        if not self._thread.is_alive():
            # collector exited -> the q2 sentinel is enqueued; give the
            # finisher its own grace period to drain in-flight batches
            self._finish_thread.join(timeout=30.0)
        if self._thread.is_alive():
            # worker still mid-batch after the grace period (e.g. a cold
            # compile or wedged device call).  Items still sitting in the
            # queue have NOT been dispatched — fail their futures so
            # callers blocked in submit() don't hang forever — but keep
            # the sentinel flowing: drain everything, re-enqueue one
            # sentinel for the worker's eventual exit, then fail the rest.
            # (_closed is set, so nothing new can be enqueued; if the
            # worker races us and steals an item mid-drain it will serve
            # it normally, which is fine.)
            drained = []
            while True:
                try:
                    drained.append(self._q.get_nowait())
                except queue.Empty:
                    break
            self._q.put(None)
            for item in drained:
                if item is not None and not item.future.done():
                    item.future.set_exception(
                        RuntimeError(
                            "MicroBatcher closed before this request was "
                            "dispatched (worker did not exit within the "
                            "grace period)"
                        )
                    )
            return
        # worker exited; nothing can be enqueued after the sentinel (the
        # lock orders every accepted put before it), so any leftover is a
        # stray sentinel only — drain defensively
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item.future.done():
                item.future.set_exception(
                    RuntimeError("MicroBatcher closed")
                )

    # ---------------------------------------------------------- worker ----

    def _collect(self) -> Optional[List[_Item]]:
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # close() while coalescing: finish this batch
                self._q.put(None)
                break
            batch.append(nxt)
        return batch

    def _dispatch_batch(self, batch: Sequence[_Item]):
        bs = next(b for b in self.buckets if b >= len(batch))
        clouds = np.stack(
            [it.sampled for it in batch]
            + [batch[-1].sampled] * (bs - len(batch))
        )
        return bs, self.pipe.dispatch_grasps_batch(clouds)

    def _finish_batch(self, batch: Sequence[_Item], bs: int, refs):
        ggs = self.pipe.finish_grasps_batch(refs)[: len(batch)]
        if self.collision_thresh > 0:
            idx = [i for i, it in enumerate(batch) if it.scene_ds is not None]
            if idx:
                # pad the collision call to the SAME bucket as the net
                # program: without this every distinct partial-batch size
                # compiles a fresh vmapped collision program (measured 3x
                # slower end-to-end through the tunneled backend)
                pad = bs - len(idx)
                filtered = self.pipe.collision_filter_batch(
                    [ggs[i] for i in idx] + [ggs[idx[-1]]] * pad,
                    [batch[i].scene_ds for i in idx]
                    + [batch[idx[-1]].scene_ds] * pad,
                    self.collision_thresh,
                    self.voxel_size,
                    self.approach_dist,
                    pre_downsampled=True,
                )
                for i, gg in zip(idx, filtered):
                    ggs[i] = gg
        return ggs

    def _loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                self._q2.put(None)  # propagate shutdown to the finisher
                return
            try:
                bs, refs = self._dispatch_batch(batch)
            except BaseException as e:  # noqa: BLE001 — deliver, don't die
                for it in batch:
                    if not it.future.done():
                        it.future.set_exception(e)
                continue
            self.dispatches += 1
            self._q2.put((batch, bs, refs))

    def _finish_loop(self):
        while True:
            got = self._q2.get()
            if got is None:
                return
            batch, bs, refs = got
            try:
                ggs = self._finish_batch(batch, bs, refs)
            except BaseException as e:  # noqa: BLE001 — deliver, don't die
                for it in batch:
                    if not it.future.done():
                        it.future.set_exception(e)
                continue
            self.frames += len(batch)
            for it, gg in zip(batch, ggs):
                it.future.set_result(gg)
