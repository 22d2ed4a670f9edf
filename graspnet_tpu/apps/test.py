"""Test/inference entry point (equivalent of reference test.py).

Two phases, same as the reference: (1) inference over a test split, dumping
per-frame (M,17) grasp arrays (optionally collision-filtered against the raw
full-resolution cloud, reference test.py:92-96); (2) AP evaluation over the
dump directory via graspnet_tpu.eval (requires the dataset's object models).

    python -m graspnet_tpu.apps.test --dataset_root /data/graspnet \
        --camera realsense --split test_seen --checkpoint_path ckpt \
        --dump_dir logs/dump --collision_thresh 0.01
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.data.dataset import GraspNetDataset
from graspnet_tpu.apps.pipeline import GraspPipeline


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--camera", default="kinect", choices=["kinect", "realsense"])
    p.add_argument("--split", default="test_seen")
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--dump_dir", required=True)
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--collision_thresh", type=float, default=0.01)
    p.add_argument("--voxel_size", type=float, default=0.01)
    p.add_argument("--num_workers", type=int, default=30, help="eval processes")
    p.add_argument(
        "--batch_size", type=int, default=1,
        help="frames per device batch (amortizes dispatch overhead)",
    )
    p.add_argument(
        "--devices", type=int, default=1,
        help="shard each inference batch over this many local devices "
        "(scenes round-robin, params replicated); the effective batch is "
        "batch_size * devices",
    )
    p.add_argument("--skip_eval", action="store_true")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument(
        "--profile_dir", default=None,
        help="capture an XLA device trace of the inference loop here",
    )
    p.add_argument(
        "--tiny", action="store_true",
        help="scaled-down model config (smoke tests / CI)",
    )
    return p.parse_args()


def inference(args, cfg, dataset=None):
    """Dump grasps for a split; returns {total_s, ms_per_frame, stages}.

    `dataset` injection lets the app-level throughput bench
    (scripts/bench_test_app.py) run this exact loop over synthetic
    production-shape frames without a dataset on disk.
    """
    if dataset is None:
        dataset = GraspNetDataset(
            args.dataset_root, camera=args.camera, split=args.split,
            num_points=cfg.num_point, remove_outlier=True, load_label=False,
            cfg=cfg,
        )
    mesh = None
    if getattr(args, "devices", 1) > 1:
        # multi-device eval: frames round-robin over a 1-D data mesh,
        # one scene's cloud always whole on one chip (SURVEY §2.9 plan)
        from graspnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.devices)
    pipe = GraspPipeline(cfg=cfg, checkpoint_path=args.checkpoint_path, mesh=mesh)
    # the loop below runs get_grasps_batch (raw decode program) at batch
    # shape — compile exactly that, not the fused single-frame program
    bs = max(args.batch_size, 1) * max(getattr(args, "devices", 1), 1)
    compile_s = pipe.warmup(topk=False, batch_size=bs)
    print(f"compile: {compile_s:.1f}s; frames: {len(dataset)}")

    import concurrent.futures as cf

    from graspnet_tpu.utils.tracing import StageTimer, device_trace

    n = len(dataset) if args.max_frames is None else min(args.max_frames, len(dataset))
    if hasattr(dataset, "_frame_cache_cap"):
        # each frame is read twice (get_data + get_raw_cloud); the LRU must
        # span the prefetch window (3*bs) plus the postproc backlog
        # (<= 4 batches) or frames evict before their second read.  A
        # user-set GRASPNET_FRAME_CACHE is a memory bound — honor it and
        # just warn about the re-decode cost instead of overriding.
        want = 8 * bs
        if "GRASPNET_FRAME_CACHE" in os.environ:
            if dataset._frame_cache_cap < want:
                print(
                    f"GRASPNET_FRAME_CACHE={dataset._frame_cache_cap} < {want}"
                    " (8*batch); honoring the bound — frames may be decoded"
                    " twice"
                )
        else:
            dataset._frame_cache_cap = max(dataset._frame_cache_cap, want)
    timer = StageTimer()
    tic = time.time()
    # thread-pool prefetch: frame PNG decode (~100ms/frame) overlaps with
    # device inference; pool sized to stay ahead of one batch
    pool = cf.ThreadPoolExecutor(max_workers=max(4, bs))
    futures = {i: pool.submit(dataset.get_data, i) for i in range(min(2 * bs, n))}
    # postproc runs on host threads, overlapped with the next batch's device
    # inference: raw-cloud voxel downsampling fans out per frame on
    # post_pool (it starts during the batch's own inference), then ONE
    # batched device collision call covers the whole batch — one transfer +
    # one fetch instead of a tunnel/PCIe round trip per frame per array
    post_pool = cf.ThreadPoolExecutor(max_workers=4)
    batch_pool = cf.ThreadPoolExecutor(max_workers=2)
    post_futures = []

    def downsample_frame(i):
        from graspnet_tpu import native

        with timer.stage("collision"):
            return native.voxel_downsample(
                dataset.get_raw_cloud(i), args.voxel_size
            )

    def postproc_batch(ids, refs, ds_futs):
        # fetch the decode results HERE (not on the dispatch loop): the
        # main thread has already moved on to the next batch, so this
        # batch's device time + result transfer overlap that host work
        with timer.stage("fetch"):
            ggs = pipe.finish_grasps_batch(refs)[: len(ids)]
        if args.collision_thresh > 0:
            ds = [f.result() for f in ds_futs]
            with timer.stage("collision"):
                ggs = pipe.collision_filter_batch(
                    ggs, ds, args.collision_thresh, args.voxel_size,
                    pre_downsampled=True,
                )
        for i, gg in zip(ids, ggs):
            with timer.stage("dump"):
                scene, frame = dataset.frames[i]
                save_dir = os.path.join(args.dump_dir, scene, args.camera)
                os.makedirs(save_dir, exist_ok=True)
                gg.save_npy(os.path.join(save_dir, f"{frame:04d}.npy"))

    with device_trace(args.profile_dir):
        for start in range(0, n, bs):
            ids = list(range(start, min(start + bs, n)))
            for j in range(start + 2 * bs, min(start + 3 * bs, n)):
                if j not in futures:
                    futures[j] = pool.submit(dataset.get_data, j)
            with timer.stage("data"):
                samples = [futures.pop(i).result() for i in ids]
            ds_futs = (
                [post_pool.submit(downsample_frame, i) for i in ids]
                if args.collision_thresh > 0
                else []
            )
            with timer.stage("net"):
                clouds = np.stack([s["point_clouds"] for s in samples])
                if len(ids) < bs:
                    # pad the tail batch to the compiled shape (and to the
                    # mesh divisibility requirement); extra rows discarded
                    pad = np.repeat(clouds[-1:], bs - len(ids), axis=0)
                    clouds = np.concatenate([clouds, pad], axis=0)
                refs = pipe.dispatch_grasps_batch(clouds)
            post_futures.append(
                batch_pool.submit(postproc_batch, ids, refs, ds_futs)
            )
            # backpressure: bound in-flight batches so device result
            # buffers and undumped groups don't pile up if postproc lags
            while len(post_futures) > 3:
                post_futures.pop(0).result()
            # surface postproc failures immediately instead of after the
            # whole split has been inferred
            still = []
            for fut in post_futures:
                if fut.done():
                    fut.result()
                else:
                    still.append(fut)
            post_futures = still
            done = ids[-1] + 1
            if done % 100 < bs:
                print(
                    f"{done}/{n} frames, {(time.time()-tic)/done*1000:.1f} "
                    f"ms/frame  [{timer.report()}]"
                )
    for f in post_futures:
        f.result()  # surface postproc errors; all dumps complete
    batch_pool.shutdown()
    post_pool.shutdown()
    pool.shutdown(wait=False, cancel_futures=True)
    total_s = time.time() - tic
    print(f"inference done: {total_s:.1f}s total  [{timer.report()}]")
    return {
        "total_s": total_s,
        "ms_per_frame": total_s / max(n, 1) * 1000,
        "frames": n,
        "compile_s": compile_s,
        "stages_ms": {k: v * 1000 for k, v in timer.summary().items()},
    }


def evaluate(args) -> None:
    """AP eval + README-format table (reference README.md:94-109 layout:
    AP | AP0.8 | AP0.4, with seen/similar/novel rows for the full split)."""
    from graspnet_tpu.data.dataset import SPLITS
    from graspnet_tpu.eval.ap import GraspNetEval, summarize

    ge = GraspNetEval(args.dataset_root, camera=args.camera, split=args.split)
    res, _ = ge.eval_all(args.dump_dir, proc=args.num_workers)
    np.save(os.path.join(args.dump_dir, f"ap_{args.camera}.npy"), res)

    def row(name, r):
        s = summarize(r)
        print(
            f"{name:<14s} AP {s['AP']:6.2f} | AP0.8 {s['AP0.8']:6.2f} "
            f"| AP0.4 {s['AP0.4']:6.2f}"
        )

    print(f"==== {args.camera} / {args.split} ====")
    row(args.split, res)
    if args.split == "test" and len(res):
        # per-subsplit rows: res rows follow ge.evaluated_scenes order
        ids = np.asarray([int(s.split("_")[1]) for s in ge.evaluated_scenes])
        for sub in ("test_seen", "test_similar", "test_novel"):
            mask = np.isin(ids, list(SPLITS[sub]))
            if mask.any():
                row(sub, res[mask])


def main():
    args = parse_args()
    cfg = (
        GraspNetConfig.tiny()
        if args.tiny
        else GraspNetConfig(num_point=args.num_point)
    )
    inference(args, cfg)
    if not args.skip_eval:
        evaluate(args)


if __name__ == "__main__":
    main()
