"""Service throughput under concurrent load: micro-batching on vs off.

Drives GraspService.compute() (the exact core the TCP/ROS wrappers call)
from N concurrent request threads over production-shape requests — 250k-pt
raw capture clouds, depth filter + sample + inference + collision filter +
sort/NMS per request — and reports sustained requests/s with max_batch=1
(reference-style one-program-per-trigger serving) vs max_batch=8
(apps/batching.MicroBatcher coalescing).

    timeout 1800 python scripts/bench_service.py [--requests 160] \
        [--clients 16] [--out perf/service_batching_r4.json]

compute() is driven in-process (the ROS consumer path) rather than over
TCP so the measurement is the serving pipeline, not JSON encoding of 250k
points.
"""

import argparse
import concurrent.futures as cf
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_clouds(n_frames, n_points, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    clouds = []
    for _ in range(n_frames):
        # table plane + object blobs in the service depth window
        table = rng.uniform(-0.3, 0.3, (n_points * 3 // 4, 3)).astype("float32")
        table[:, 2] = rng.uniform(0.55, 0.58, len(table))
        objs = rng.uniform(-0.1, 0.1, (n_points // 4, 3)).astype("float32")
        objs[:, 2] = rng.uniform(0.4, 0.5, len(objs))
        clouds.append(np.concatenate([table, objs]))
    return clouds


def make_learnable_clouds(n_frames, tmp_root, cfg):
    """Request clouds drawn from the learnable test scene — paired with the
    learnability-gate checkpoint they make requests actually RETURN grasps,
    so the success path (extract + NMS + TF) is inside the timed loop."""
    from graspnet_tpu.data.dataset import GraspNetDataset
    from graspnet_tpu.data.learnable import make_learnable_dataset

    if not os.path.isdir(os.path.join(tmp_root, "scenes")):
        make_learnable_dataset(tmp_root, cfg=cfg)
    ds = GraspNetDataset(
        tmp_root, camera="realsense", split="test_seen",
        num_points=cfg.num_point, remove_outlier=True, load_label=False,
        cfg=cfg,
    )
    return [ds.get_raw_cloud(i % len(ds)).copy() for i in range(n_frames)]


def run_mode(max_batch, clouds, clients, collision_thresh,
             checkpoint_path=None, model_cfg=None, num_point=20000):
    from graspnet_tpu.apps.service import GraspService, ServiceConfig

    svc = GraspService(
        ServiceConfig(
            collision_thresh=collision_thresh,
            max_batch=max_batch,
            batch_wait_ms=3.0,
            checkpoint_path=checkpoint_path,
            model_cfg=model_cfg,
            num_point=num_point,
        )
    )
    # warm every program + the collision bucket once
    svc.compute(clouds[0])
    tic = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=clients) as pool:
        outs = list(pool.map(svc.compute, clouds))
    wall = time.perf_counter() - tic
    ok = sum(1 for o in outs if o.get("ok"))
    dispatches = svc.batcher.dispatches if svc.batcher else len(clouds)
    svc.close()
    return {
        "max_batch": max_batch,
        "requests": len(clouds),
        "ok": ok,
        "wall_s": round(wall, 2),
        "requests_per_s": round(len(clouds) / wall, 2),
        "ms_per_request_sustained": round(wall / len(clouds) * 1000, 2),
        "device_dispatches": dispatches,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=160)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--points", type=int, default=250_000)
    ap.add_argument("--collision_thresh", type=float, default=0.01)
    ap.add_argument(
        "--checkpoint", default=None,
        help="trained checkpoint so requests return grasps (ok > 0)",
    )
    ap.add_argument(
        "--learnable", default=None, metavar="DIR",
        help="tiny-config success-path mode: request clouds from the "
        "learnable test scene in DIR (generated if absent), pair with a "
        "learnability-gate --checkpoint",
    )
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    model_cfg, num_point = None, 20000
    if args.learnable:
        import dataclasses

        from graspnet_tpu.config import GraspNetConfig

        model_cfg = dataclasses.replace(GraspNetConfig.tiny(), num_point=1024)
        num_point = model_cfg.num_point
        clouds = make_learnable_clouds(args.requests, args.learnable, model_cfg)
    else:
        clouds = make_clouds(args.requests, args.points)
    rows = [
        run_mode(
            mb, clouds, args.clients, args.collision_thresh,
            checkpoint_path=args.checkpoint, model_cfg=model_cfg,
            num_point=num_point,
        )
        for mb in (1, 8)
    ]
    base, batched = rows
    if args.learnable:
        metric = (
            "service success-path throughput, 16 concurrent clients, "
            "learnable-scene requests + trained checkpoint (every reply "
            "carries real grasps: extract + NMS + TF inside the timed loop)"
        )
    else:
        metric = (
            "service sustained throughput, 16 concurrent clients, "
            "250k-pt requests, collision filter on"
        )
    result = {
        "metric": metric,
        "value": batched["requests_per_s"],
        "unit": "requests/s",
        "speedup_vs_unbatched": round(
            batched["requests_per_s"] / base["requests_per_s"], 2
        ),
        "modes": rows,
        "backend": jax.devices()[0].platform,
        "source": "scripts/bench_service.py",
        "note": "compute() driven in-process from concurrent threads (the "
        "ROS-consumer call path); max_batch=8 coalesces requests into "
        "batched device programs via apps/batching.MicroBatcher. On ONE "
        "chip coalescing is NOT a win for this model: the serving kernels "
        "are full-width at batch 1 (per-frame device time is flat in "
        "batch, PERF.md), so batching only trades per-request dispatch "
        "overhead against serializing transfers in the batch worker that "
        "concurrent client threads otherwise overlap. Its deployment "
        "domain is data_devices > 1, where a coalesced batch shards "
        "one-frame-per-chip (validated on the virtual mesh in "
        "tests/test_service_batching.py). ok=0 under random-init weights "
        "is expected (every decoded grasp collides; the 'no valid grasp' "
        "reply still paid the full inference + collision + sort/NMS work "
        "this bench times).",
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
