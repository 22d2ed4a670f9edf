"""Fleet-serving throughput model: requests/s vs `--data_devices` (r4 #5).

The MicroBatcher's deployment domain is the data-mesh fleet
(perf/service_batching_r4.json records the honest single-chip 0.49x).
This script turns that claim into numbers:

  1. MEASURE on the attached chip: batched decode+NMS+top-K device time
     at B in {1, 2, 4, 8} (drained, every result fetched) and the
     per-dispatch overhead — per-frame device time is flat in B because
     the Pallas kernels iterate scenes on the sequential grid axis
     (PERF.md), which is exactly why one-frame-per-chip data sharding
     scales.
  2. VALIDATE the non-hardware half on the virtual 8-device CPU mesh:
     coalescing occupancy (mean batch fill) and queue wait of the real
     GraspService + MicroBatcher under 16 concurrent clients — the
     batching logic a real fleet would run, minus the chips.
  3. PROJECT requests/s at D devices: a coalesced batch of B = D frames
     runs one-frame-per-chip, so
        t_batch(D) ~ t_frame_device + t_dispatch + D * t_transfer_frame
        requests/s(D) ~ occupancy * D / t_batch(D)
     reported for the measured tunnel dispatch cost and for a
     direct-attached host (~1 ms dispatch, transfers at PCIe rates).

Usage:  python scripts/fleet_projection.py [--out perf/fleet_projection_r5.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OCCUPANCY_CHECK = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import json, time
import concurrent.futures as cf
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

from graspnet_tpu.apps.service import GraspService, ServiceConfig
from graspnet_tpu.config import GraspNetConfig

svc = GraspService(ServiceConfig(
    model_cfg=GraspNetConfig.tiny(), num_point=512,
    collision_thresh=-1.0, data_devices=8, max_batch=8, batch_wait_ms=3.0,
))
rng = np.random.default_rng(0)
clouds = [rng.uniform(-0.3, 0.3, (2048, 3)).astype("float32") + [0, 0, 0.45]
          for _ in range(64)]
svc.compute(clouds[0])  # warm
t0 = time.perf_counter()
with cf.ThreadPoolExecutor(max_workers=16) as pool:
    outs = list(pool.map(svc.compute, clouds))
wall = time.perf_counter() - t0
d = svc.batcher.dispatches
frames = svc.batcher.frames
svc.close()
print(json.dumps({
    "requests": len(clouds), "dispatches": d,
    "mean_batch_fill": round(frames / max(d, 1), 2),
    "occupancy": round(frames / max(d, 1) / 8, 3),
    "wall_s": round(wall, 2),
    "errors": sum(1 for o in outs if "error" in o),
}))
"""


def measure_device(batches=(1, 2, 4, 8), k=20):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from graspnet_tpu.apps.pipeline import GraspPipeline
    from graspnet_tpu.config import GraspNetConfig

    cfg = GraspNetConfig()
    pipe = GraspPipeline(cfg=cfg, seed=0)
    rng = np.random.default_rng(0)
    rows = {}
    for b in batches:
        x = jnp.asarray(
            rng.uniform(-0.5, 0.5, (b, cfg.num_point, 3)).astype("float32")
        )
        fn = pipe._infer_for_batch(b)
        jax.device_get(fn(pipe.params, x))  # compile
        t0 = time.perf_counter()
        outs = []
        for _ in range(k):
            r, v = fn(pipe.params, x)
            r.copy_to_host_async()
            v.copy_to_host_async()
            outs.append((r, v))
        got = [(np.asarray(r), np.asarray(v)) for r, v in outs]
        assert len(got) == k
        per_batch = (time.perf_counter() - t0) / k
        rows[b] = {
            "ms_per_batch": round(per_batch * 1000, 2),
            "ms_per_frame": round(per_batch / b * 1000, 2),
        }
    # dispatch overhead: sync single-frame latency minus drained time
    x1 = jnp.asarray(
        rng.uniform(-0.5, 0.5, (1, cfg.num_point, 3)).astype("float32")
    )
    fn = pipe._infer_for_batch(1)
    t0 = time.perf_counter()
    for _ in range(10):
        jax.device_get(fn(pipe.params, x1))
    sync_ms = (time.perf_counter() - t0) / 10 * 1000
    return rows, round(sync_ms, 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    rows, sync_ms = measure_device()
    drained1 = rows[1]["ms_per_frame"]
    dispatch_tunnel = max(sync_ms - drained1, 0.0)  # ~RPC round trip

    # occupancy of the real batching stack on the virtual 8-device mesh
    proc = subprocess.run(
        [sys.executable, "-c", OCCUPANCY_CHECK],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1800,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"},
    )
    occ_lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    occupancy = json.loads(occ_lines[-1]) if occ_lines else {
        "error": (proc.stderr or "no output")[-400:]
    }

    # projection: one frame per chip, transfers ~0.24 MB/frame in
    frame_mb = 0.24
    curves = {}
    for label, disp_ms, bw_mbps in (
        ("tunnel", dispatch_tunnel, 55.0),
        ("direct_attach", 1.0, 8000.0),
    ):
        curve = {}
        for d in (1, 2, 4, 8, 16):
            t_batch = (
                rows[1]["ms_per_frame"]
                + disp_ms
                + d * frame_mb / bw_mbps * 1000
            )
            fill = occupancy.get("occupancy", 1.0)
            curve[d] = round(1000.0 / t_batch * d * fill, 1)
        curves[label] = curve

    result = {
        "metric": "fleet serving projection: requests/s vs data_devices",
        "value": curves.get("direct_attach", {}).get(8, 0.0),
        "unit": "requests/s at 8 devices (direct-attach)",
        "measured_device_times": rows,
        "sync_single_frame_ms": sync_ms,
        "dispatch_overhead_tunnel_ms": round(dispatch_tunnel, 2),
        "occupancy_virtual_mesh": occupancy,
        "projection_requests_per_s": curves,
        "model": "t_batch(D) = per-frame device time (flat in B: Pallas "
        "kernels iterate scenes on the sequential grid axis, so one frame "
        "per chip keeps the per-chip time constant) + dispatch overhead + "
        "D * 0.24 MB transfer; requests/s = occupancy * D / t_batch",
        "backend": jax.default_backend(),
        "source": "scripts/fleet_projection.py",
        "note": "occupancy + queue behavior come from the REAL GraspService"
        " + MicroBatcher stack on the virtual 8-device CPU mesh (the "
        "non-hardware half of the claim); device times from the attached "
        "chip; multi-chip hardware is unavailable in this environment, so "
        "the curve is a model anchored on those measurements, not a "
        "multi-chip wall-clock.",
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
