"""Offline tolerance-label generation CLI.

Mirrors reference dataset/generate_tolerance_label.py (canonical invocation
`python generate_tolerance_label.py --dataset_root ... --num_workers 50`,
command_generate_tolerance_label.sh): reads
`{dataset_root}/grasp_label/{obj:03d}_labels.npz` for each object and writes
`{save_dir}/{obj:03d}_tolerance.npy` with the (P, V, A, D) tolerance labels.

The reference spins a 50-process pool, one python worker per label point
(generate_tolerance_label.py:31-79); here each object is one batched device
computation (data/tolerance.py) — no worker pool flag needed.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True, help="GraspNet-1B root")
    p.add_argument(
        "--save_dir", default=None,
        help="output dir (default: {dataset_root}/tolerance)",
    )
    p.add_argument(
        "--pos_ratio_thresh", type=float, default=0.8,
        help="positive-neighbor ratio threshold [reference default 0.8]",
    )
    p.add_argument(
        "--mu_thresh", type=float, default=0.55,
        help="friction coefficient threshold [reference default 0.55]",
    )
    p.add_argument("--num_objects", type=int, default=88)
    p.add_argument(
        "--objects", default=None,
        help="comma-separated object ids (default: all present)",
    )
    return p.parse_args()


def main():
    args = parse_args()
    from graspnet_tpu.data.tolerance import generate_tolerance

    save_dir = args.save_dir or os.path.join(args.dataset_root, "tolerance")
    os.makedirs(save_dir, exist_ok=True)

    if args.objects:
        obj_ids = [int(x) for x in args.objects.split(",")]
    else:
        obj_ids = [
            i
            for i in range(args.num_objects)
            if os.path.exists(
                os.path.join(args.dataset_root, "grasp_label", f"{i:03d}_labels.npz")
            )
        ]

    for i in obj_ids:
        t0 = time.time()
        label = np.load(
            os.path.join(args.dataset_root, "grasp_label", f"{i:03d}_labels.npz")
        )
        tol = generate_tolerance(
            label["points"].astype(np.float32),
            label["scores"].astype(np.float32),
            pos_ratio_thresh=args.pos_ratio_thresh,
            mu_thresh=args.mu_thresh,
        )
        out = os.path.join(save_dir, f"{i:03d}_tolerance.npy")
        np.save(out, tol)
        print(
            f"object {i:03d}: {tol.shape} -> {out} ({time.time() - t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
