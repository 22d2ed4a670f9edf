"""Validate a converted reference checkpoint end-to-end.

Given the published torch checkpoint (`checkpoint-rs.tar` /
`checkpoint-kn.tar`, reference README.md:74-83), this tool:

  1. converts it to the framework's params pytree (checkpoint.py) and
     reports any unconsumed / missing state-dict keys;
  2. runs the full network + decode on the reference example frame
     (doc/example_data) and prints the top-K grasps;
  3. optionally compares against a golden dump (.npy of (K, 17) rows
     produced by the reference implementation) row-by-row — the
     "bit-matched top-50" gate from SURVEY.md §7.

Usage:
    python scripts/verify_checkpoint.py --checkpoint checkpoint-rs.tar \
        --data_dir /path/to/doc/example_data [--golden ref_top50.npy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="torch .tar checkpoint")
    p.add_argument("--data_dir", required=True, help="reference example_data dir")
    p.add_argument("--golden", default=None, help="reference top-K dump (.npy)")
    p.add_argument("--top_k", type=int, default=50)
    p.add_argument("--collision_thresh", type=float, default=-1.0)
    p.add_argument("--atol", type=float, default=1e-4)
    args = p.parse_args()

    import torch

    from graspnet_tpu import checkpoint
    from graspnet_tpu.apps.image_demo import load_frame
    from graspnet_tpu.apps.pipeline import GraspPipeline
    from graspnet_tpu.config import GraspNetConfig

    # --- 1. conversion audit -------------------------------------------------
    # weights_only=False: the published .tar pickles optimizer state / loss
    # objects that torch>=2.6's safe loader rejects (same flag as
    # checkpoint.load_torch_checkpoint)
    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = checkpoint.convert_torch_state_dict(sd)

    def count_leaves(t):
        import jax

        return sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(t))

    n_params = count_leaves(params)
    n_sd = sum(v.size for k, v in sd.items() if "num_batches_tracked" not in k)
    print(f"converted params: {n_params:,} values (state dict: {n_sd:,})")
    if n_params != n_sd:
        print("WARNING: parameter count mismatch — conversion may be lossy")

    # --- 2. example-frame inference -----------------------------------------
    cfg = GraspNetConfig()
    pipe = GraspPipeline(params=params, cfg=cfg)
    # nms=False matches the run() call below (golden rows are pre-NMS), so
    # the timed compile is the program that actually executes
    print(f"compile: {pipe.warmup(nms=False):.1f}s")
    scene_cloud = load_frame(args.data_dir)
    sampled = pipe.sample_cloud(scene_cloud)
    gg = pipe.run(
        sampled,
        scene_cloud=scene_cloud,
        collision_thresh=args.collision_thresh,
        nms=False,  # golden comparisons are pre-NMS sorted rows
        top_k=args.top_k,
    )
    print(f"top-{args.top_k} grasps (score-sorted):")
    for g in gg[:5].grasp_group_array:
        print(
            f"  score={g[0]:+.4f} width={g[1]:.4f} depth={g[3]:.3f} "
            f"center=({g[13]:+.4f},{g[14]:+.4f},{g[15]:+.4f})"
        )

    # --- 3. golden comparison ------------------------------------------------
    if args.golden:
        golden = np.load(args.golden)
        ours = gg.grasp_group_array[: len(golden)]
        if len(ours) != len(golden):
            print(f"FAIL: row count {len(ours)} != golden {len(golden)}")
            raise SystemExit(1)
        diff = np.abs(ours - golden)
        print(f"max abs diff vs golden: {diff.max():.2e}")
        if diff.max() > args.atol:
            bad = np.argwhere(diff > args.atol)
            print(f"FAIL: {len(bad)} entries exceed atol={args.atol}")
            raise SystemExit(1)
        print("PASS: matches golden dump")


if __name__ == "__main__":
    main()
