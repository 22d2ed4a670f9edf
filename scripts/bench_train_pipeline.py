"""Sustained pipelined training benchmark with the real loader (round-4 #1).

Runs the exact apps/train.py loop (DataLoader workers -> Trainer.prepare /
step_prepared double buffering, compact labels) over a production-shape
synthetic dataset (graspnet_tpu.data.synthetic) for >= `--steps` pipelined
steps and reports the sustained wall ms/step next to its components:

  device_step_ms        slope-timed jitted train step
  stage1_ms             slope-timed compact-path pre-pass (backbone+approach)
  host_prep_ms_per_scene  one get_data_label call (loader-worker work)
  finalize_ms_per_batch   phase-B matched-label slicing (critical path)
  rpc_floor_ms          p50 of a trivial device_get through the backend —
                        on the tunneled chip this is ~26-40 ms of pure RPC
                        that a direct-attached host would not pay; the
                        compact path syncs once per step (top-view fetch),
                        so sustained_ms_per_step includes one such floor.

The pipelined floor on an N-core host is
  max(device_step + stage1, batch * host_prep / min(cores, workers)) + finalize
plus one RPC floor per step on a tunneled backend.  Reference counterpart:
train.py:120-157 (per-epoch loop over the torch DataLoader).

Usage:  timeout 1800 python scripts/bench_train_pipeline.py \
            [--steps 20] [--workers 4] [--out perf/train_e2e_r4.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.data.dataset import DataLoader
    from graspnet_tpu.data.synthetic import SyntheticGraspNetDataset
    from graspnet_tpu.train.trainer import Trainer, TrainConfig

    cfg = GraspNetConfig()
    n_frames = (args.steps + args.warmup + 2) * args.batch
    t0 = time.perf_counter()
    ds = SyntheticGraspNetDataset(n_frames=n_frames, cfg=cfg)
    gen_s = time.perf_counter() - t0

    # loader-worker work per scene: one full get_data_label call, serial
    for _ in range(2):  # warm numpy/native paths + stat caches
        ds.get_data_label(0)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        ds.get_data_label(i)
    host_prep_ms = (time.perf_counter() - t0) / reps * 1000

    trainer = Trainer(cfg=cfg, tc=TrainConfig(batch_size=args.batch), seed=0)
    trainer.set_epoch(0)

    loader = DataLoader(
        ds, args.batch, shuffle=True, num_workers=args.workers, drop_last=True
    )
    loader.set_epoch(0)

    # -- sustained pipelined loop (the apps/train.py pattern) ----------------
    it = iter(loader)
    pending = trainer.prepare(next(it))
    step = 0
    compile_s = None
    t_start = None
    done = 0
    t0 = time.perf_counter()
    while pending is not None and done < args.warmup + args.steps:
        loss, _ = trainer.step_prepared(pending)
        try:
            pending = trainer.prepare(next(it))
        except StopIteration:
            pending = None
        if step == 0:
            jax.device_get(loss)
            compile_s = time.perf_counter() - t0
        step += 1
        done += 1
        if done == args.warmup:
            jax.device_get(loss)
            t_start = time.perf_counter()
    jax.device_get(loss)
    sustained_ms = (time.perf_counter() - t_start) / (done - args.warmup) * 1000

    # -- component times -----------------------------------------------------
    # finalize (phase B, critical path between top-view fetch and dispatch)
    loader.set_epoch(1)
    it = iter(loader)
    batch = next(it)
    handle = trainer.prepare(batch)
    jax.device_get(handle[2])  # exclude stage-1 wait from the finalize time
    t0 = time.perf_counter()
    trainer._finalize_batch(handle)
    finalize_ms = (time.perf_counter() - t0) * 1000

    # RPC floor: p50 of a full put+get round trip on a tiny FRESH array each
    # time (re-fetching a cached array would skip the tunnel entirely)
    syncs = []
    for i in range(15):
        t0 = time.perf_counter()
        jax.device_get(jax.device_put(np.full(8, i, np.float32)))
        syncs.append((time.perf_counter() - t0) * 1000)
    rpc_floor_ms = float(np.percentile(syncs, 50))

    # device step + stage1 via the slope method (chained dispatch, one sync)
    db = trainer._finalize_batch(trainer.prepare(batch))
    mom = jnp.float32(0.5)
    times = {}
    for k in (4, 24):
        p, o = trainer.params, trainer.opt_state
        t0 = time.perf_counter()
        for _ in range(k):
            p, o, loss, _ = trainer._train_step(p, o, db, mom)
        jax.device_get(loss)
        times[k] = time.perf_counter() - t0
    device_step_ms = (times[24] - times[4]) / 20 * 1000

    small = trainer.prepare(batch)[0]
    for k in (4, 24):
        t0 = time.perf_counter()
        for _ in range(k):
            top = trainer._stage1_top_view(
                trainer.params, small["point_clouds"], small["sa_inds"]
            )
        jax.device_get(top)
        times[k] = time.perf_counter() - t0
    stage1_ms = (times[24] - times[4]) / 20 * 1000

    ncores = len(os.sched_getaffinity(0))
    host_side = args.batch * host_prep_ms / min(ncores, args.workers)
    floor = max(device_step_ms + stage1_ms, host_side) + finalize_ms
    out = {
        "metric": "sustained pipelined train step (batch %d, 20k pts, compact labels)"
        % args.batch,
        "value": round(sustained_ms, 1),
        "unit": "ms/step",
        "device_step_ms": round(device_step_ms, 1),
        "stage1_ms": round(stage1_ms, 1),
        "host_prep_ms_per_scene": round(host_prep_ms, 1),
        "finalize_ms_per_batch": round(finalize_ms, 1),
        "rpc_floor_ms": round(rpc_floor_ms, 1),
        "pipelined_floor_ms": round(floor, 1),
        "sustained_ex_rpc_ms": round(sustained_ms - rpc_floor_ms, 1),
        "host_cores": ncores,
        "workers": args.workers,
        "steps_timed": done - args.warmup,
        "compile_s": round(compile_s, 1),
        "datagen_s": round(gen_s, 1),
        "backend": jax.default_backend(),
        "source": "scripts/bench_train_pipeline.py",
        "note": "per step the compact path pays one top-view device_get; "
        "finalize_ms_per_batch is the post-fetch critical path (matched-"
        "slab gather + the ~0.7 MB matched put ENQUEUE) — the top-view-"
        "independent label half (~3.1 MB) ships during prepare(), "
        "overlapped with device work (round 5).  Through the tunnel the "
        "fetch is ~rpc_floor_ms of pure RPC and the sustained number is "
        "wire-bandwidth bound; sustained_ex_rpc_ms subtracts one floor, "
        "the honest direct-attach estimate is max(device_step+stage1, "
        "host work) + host-side finalize",
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
