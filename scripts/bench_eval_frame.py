"""AP-evaluator frame throughput (round 4: native nearest + grid prune).

Times eval/ap.eval_frame on a realistic fixed workload — 9 objects x 3000
model points, 256 dumped grasps centered on posed surfaces, full 109k-point
table slab — the shape class of a real GraspNet-1B eval frame.  Normals are
computed once per object and excluded (they are cached per object across a
real eval run).

    python scripts/bench_eval_frame.py [--out perf/eval_frame_r4.json]

`scripts/perf_check.py perf/eval_frame_r4.json` re-runs this and fails on
regression (host CPU numbers; backend recorded as 'cpu').
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def build_workload(seed=0, n_obj=9, model_pts=3000, n_grasps=256):
    import numpy as np
    import scipy.spatial.transform as st

    from graspnet_tpu.eval.ap import create_table_points
    from graspnet_tpu.eval.force_closure import estimate_normals

    rng = np.random.default_rng(seed)
    clouds = [
        rng.uniform(-0.04, 0.04, (model_pts, 3)).astype(np.float32)
        for _ in range(n_obj)
    ]
    normals = [estimate_normals(c) for c in clouds]
    poses = []
    for _ in range(n_obj):
        R = st.Rotation.random(
            random_state=int(rng.integers(1 << 31))
        ).as_matrix().astype(np.float32)
        t = rng.uniform(-0.2, 0.2, 3).astype(np.float32)
        t[2] += 0.5
        P = np.zeros((3, 4), np.float32)
        P[:3, :3] = R
        P[:, 3] = t
        poses.append(P)
    g = np.zeros((n_grasps, 17), np.float32)
    g[:, 0] = rng.uniform(0, 1, n_grasps)
    g[:, 1] = rng.uniform(0.02, 0.1, n_grasps)
    g[:, 2] = 0.02
    g[:, 3] = rng.uniform(0.01, 0.04, n_grasps)
    g[:, 4:13] = (
        st.Rotation.random(n_grasps, random_state=3)
        .as_matrix()
        .reshape(n_grasps, 9)
        .astype(np.float32)
    )
    oi = rng.integers(0, n_obj, n_grasps)
    g[:, 13:16] = np.stack(
        [
            clouds[o][rng.integers(0, model_pts)] @ poses[o][:3, :3].T
            + poses[o][:, 3]
            for o in oi
        ]
    )
    return g, clouds, normals, poses, create_table_points()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from graspnet_tpu.eval.ap import eval_frame

    g, clouds, normals, poses, table = build_workload()
    eval_frame(g, clouds, normals, poses, table=table)  # warm
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        acc = eval_frame(g, clouds, normals, poses, table=table)
    ms = (time.perf_counter() - t0) / args.repeats * 1000
    result = {
        "metric": "eval_frame wall time (9 objects x 3k pts, 256 grasps, "
        "109k-pt table slab)",
        "value": round(ms, 1),
        "unit": "ms/frame",
        "stage_ms": {"eval_frame": round(ms, 3)},
        "acc_checksum": float(acc.sum()),
        "backend": "cpu",
        "source": "scripts/bench_eval_frame.py",
        "note": "host-CPU protocol evaluation; round-4 baseline 40 ms "
        "(pre-round-4 code: 374 ms). Normals excluded (cached per object "
        "across a real eval). Every grasp here fails collision/empty, so "
        "the timed path covers NMS + assignment + the grid-pruned "
        "collision sweep but not force-closure scoring.",
    }
    print(json.dumps(result, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
