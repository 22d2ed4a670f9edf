"""Multi-device scaling benchmark: data-parallel eval + candidate-parallel latency.

On a real TPU slice this measures frames/s vs device count for the two
sharding strategies (SURVEY.md §2.9 plan); on a dev box run it against the
virtual CPU mesh to validate the scaling *code path*:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --num_point 2048

Prints one JSON line per (mode, n_devices).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--tiny", action="store_true", help="use the tiny config")
    p.add_argument(
        "--slope", action="store_true",
        help="slope-timed DEVICE times of the sharded programs at n=1 "
        "(anchors the multi-chip latency model on a single real chip; "
        "the wall-clock loop below is RPC-floor-dominated on the tunnel)",
    )
    p.add_argument("--out", default=None, help="with --slope: stage_ms JSON")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.models import init_graspnet
    from graspnet_tpu.parallel import (
        candidate_sharded_infer,
        data_parallel_infer,
        make_mesh,
    )

    cfg = GraspNetConfig.tiny() if args.tiny else GraspNetConfig(
        num_point=args.num_point
    )
    params = init_graspnet(jax.random.PRNGKey(0), cfg)
    ndev_all = len(jax.devices())
    rng = np.random.default_rng(0)

    def sync(x):
        jax.device_get(jax.tree_util.tree_map(lambda a: a.ravel()[:1], x))

    if args.slope:
        from slope_timing import dump_records, timeit

        from graspnet_tpu.models import graspnet_forward, pred_decode
        from graspnet_tpu.utils.compile_cache import enable as enable_cache

        enable_cache()
        cloud1 = jnp.asarray(
            rng.uniform(-0.3, 0.3, (1, cfg.num_point, 3)), np.float32
        )

        def plain(p_, c):
            ep = graspnet_forward(p_, c, cfg, train=False)
            return pred_decode(ep, cfg)

        # slope harness threads its scan carry through the FIRST argument,
        # which must be an array -> cloud first, params second
        timeit("plain forward+decode (n=1)",
               lambda c, p_: plain(p_, c), cloud1, params)
        dp1 = data_parallel_infer(cfg, make_mesh(1, ("data",)))
        timeit("data_parallel_infer (n=1)",
               lambda c, p_: dp1(p_, c), cloud1, params)
        cp1 = candidate_sharded_infer(cfg, make_mesh(1, ("candidate",)))
        timeit("candidate_sharded_infer (n=1)",
               lambda c, p_: cp1(p_, c), cloud1, params)
        if args.out:
            dump_records(
                args.out, source="scripts/bench_scaling.py --slope",
                note="slope-timed device ms at n=1: the sharded programs' "
                "single-chip cost anchors PERF.md's ~3.4 + 2.0/n ms "
                "candidate-parallel latency model",
            )
        return

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= ndev_all]
    results = []
    for n in sizes:
        # data parallel: n scenes, one per device -> throughput
        mesh = make_mesh(n, ("data",))
        infer = data_parallel_infer(cfg, mesh)
        clouds = jnp.asarray(
            rng.uniform(-0.3, 0.3, (n, cfg.num_point, 3)), np.float32
        )
        sync(infer(params, clouds))  # compile
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            sync(infer(params, clouds))
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        results.append(
            {
                "mode": "data_parallel",
                "n_devices": n,
                "frames_per_s": round(n / dt, 3),
                "ms_per_batch": round(dt * 1000, 2),
            }
        )
        print(json.dumps(results[-1]), flush=True)

        # candidate parallel: ONE scene split over n devices -> latency
        if cfg.num_seed % n == 0:
            cmesh = make_mesh(n, ("candidate",))
            cinfer = candidate_sharded_infer(cfg, cmesh)
            cloud = clouds[:1]
            sync(cinfer(params, cloud))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sync(cinfer(params, cloud))
                ts.append(time.perf_counter() - t0)
            dt = float(np.median(ts))
            results.append(
                {
                    "mode": "candidate_parallel",
                    "n_devices": n,
                    "ms_per_frame": round(dt * 1000, 2),
                }
            )
            print(json.dumps(results[-1]), flush=True)

    base = next(r for r in results if r["mode"] == "data_parallel")
    top = [r for r in results if r["mode"] == "data_parallel"][-1]
    eff = top["frames_per_s"] / (base["frames_per_s"] * top["n_devices"])
    print(
        json.dumps(
            {
                "mode": "summary",
                "max_devices": top["n_devices"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
