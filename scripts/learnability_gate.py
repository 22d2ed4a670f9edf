"""End-to-end learnability gate (VERDICT r4 item #1).

The one seam no single-stage parity test covers: a TRAINED model flowing
through train -> pred_decode -> apps/test.py dump -> in-house AP
evaluator.  A sign/frame convention bug between those stages would pass
every existing oracle test (each stage is pinned in isolation) yet zero
out real AP.  This gate closes it:

  1. generate the physics-grounded learnable dataset
     (graspnet_tpu.data.learnable): rendered sphere scenes whose labels
     are scored by the SAME force-closure physics the evaluator applies;
  2. train from scratch through the real dataset/loader/compact-label
     trainer path (reference recipe train.py:96-157);
  3. dump the test_seen split through the real apps/test.py inference
     path (collision filter included, reference test.py:65-107);
  4. evaluate with eval/ap.py (reference test.py:110-114) and require
     AP(trained) >= --bar while AP(random-init) < --bar.

    python scripts/learnability_gate.py            # CPU, tiny config
    python scripts/learnability_gate.py --steps 400 --bar 10

The absolute bar is calibrated against the observed seed spread of
HEALTHY runs (seed 0: AP 24.7-26.9; seed 1: 9.6 — layout jitter changes
how many objects present easy grasps) while random init scores 0.0
exactly; a convention break between decode/dump/eval zeroes AP, so the
detection power is the full trained-vs-0 contrast, not the bar margin
(perf/learnability_r5.json carries the calibration runs).
"""

import argparse
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None, help="dataset dir (default: tmp)")
    ap.add_argument("--steps", type=int, default=600, help="train step budget")
    ap.add_argument("--bar", type=float, default=6.0, help="absolute AP bar")
    ap.add_argument("--out", default=None, help="write a JSON artifact here")
    ap.add_argument(
        "--keep", action="store_true", help="keep the tmp workdir"
    )
    ap.add_argument(
        "--seed", type=int, default=0,
        help="dataset + trainer seed (robustness probes)",
    )
    args = ap.parse_args()

    import jax
    import numpy as np

    from graspnet_tpu import checkpoint
    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.data.dataset import (
        DataLoader, GraspNetDataset, load_grasp_labels,
    )
    from graspnet_tpu.data.learnable import make_learnable_dataset
    from graspnet_tpu.eval.ap import GraspNetEval, summarize
    from graspnet_tpu.train.trainer import Trainer, TrainConfig
    from graspnet_tpu.utils.compile_cache import enable

    enable()
    # tiny backbone at a 1024-point cloud: the rendered workspace holds
    # ~1.1k points, and each labeled object needs >= 50 sampled points to
    # clear the reference's per-object threshold (dataset.py:315)
    cfg = dataclasses.replace(GraspNetConfig.tiny(), num_point=1024)

    work = args.root or tempfile.mkdtemp(prefix="graspnet_learn_")
    root = os.path.join(work, "data")
    t0 = time.time()
    if not os.path.isdir(os.path.join(root, "scenes")):
        make_learnable_dataset(root, cfg=cfg, seed=args.seed)
    gen_s = time.time() - t0
    print(f"dataset: {root} ({gen_s:.1f}s); backend: {jax.default_backend()}")

    import glob

    n_obj = len(glob.glob(os.path.join(root, "grasp_label", "*_labels.npz")))
    valid, labels = load_grasp_labels(root, num_objects=n_obj)
    # augment=True: the reference recipe's flip/rotate augmentation
    # (dataset.py:76-96) — with a tiny model on a tiny dataset it is the
    # difference between memorizing point patterns and generalizing to
    # the (held-out) test frames
    ds = GraspNetDataset(
        root, valid, labels, camera="realsense", split="train",
        num_points=cfg.num_point, remove_outlier=True, load_label=True,
        cfg=cfg, augment=True, seed=args.seed,
    )
    # batch 4 = the whole fixed frame set: per-step batch statistics are
    # constant, so the BN running stats can converge exactly to them.
    # bn_momentum_min 0.05 (reference default 0.001): with the 18-epoch
    # schedule compressed onto ~400 steps, the reference floor freezes the
    # running stats on EARLY-training activations (momentum 0.002 moves
    # them ~20% over the last 100 steps while the weights keep evolving)
    # and the eval-mode forward sees stale statistics — measured here as
    # an objectness margin of -8 at eval vs acc 1.0 at train.  The
    # reference converges because its floor applies across ~47k steps.
    bs = min(4, len(ds))
    trainer = Trainer(
        cfg=cfg, tc=TrainConfig(batch_size=bs, bn_momentum_min=0.05),
        seed=args.seed
    )
    loader = DataLoader(ds, bs, shuffle=True, num_workers=2)

    # The reference's 18-epoch lr + BN-momentum schedule (train.py:96-112)
    # compressed onto the step budget.  Critically, BN momentum must decay
    # (0.5 -> ~0.002) for the EVAL-mode forward to work at all: at a
    # constant 0.5 the running stats track only the last couple of
    # batches, and deep-layer batch statistics jitter enough that the
    # running-stat forward decorrelates from the batch-stat forward the
    # loss saw (found by this gate in round 5).
    step, hist = 0, []
    t0 = time.time()
    while step < args.steps:
        trainer.set_epoch(min(17, step * 18 // max(args.steps, 1)))
        for batch in loader:
            loss, metrics = trainer.step_compact(batch)
            step += 1
            if step >= args.steps:
                break
        hist.append(
            (
                step,
                round(float(jax.device_get(loss)), 3),
                round(
                    float(jax.device_get(metrics["stage1_objectness_acc"])), 3
                ),
            )
        )
    train_s = time.time() - t0
    print(f"trained {step} steps in {train_s:.1f}s; tail: {hist[-3:]}")

    ckpt_dir = os.path.join(work, "log")
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_path = os.path.join(os.path.abspath(ckpt_dir), "checkpoint")
    # the exact state layout apps/train.py saves — the gate also covers
    # the pipeline's train-state restore path
    checkpoint.save(
        ckpt_path,
        {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "epoch": np.int32(0),
        },
    )

    from graspnet_tpu.apps import test as test_app

    def dump_and_eval(tag: str, checkpoint_path):
        dump_dir = os.path.join(work, f"dump_{tag}")
        shutil.rmtree(dump_dir, ignore_errors=True)
        a = argparse.Namespace(
            dataset_root=root, camera="realsense", split="test_seen",
            checkpoint_path=checkpoint_path, dump_dir=dump_dir,
            num_point=cfg.num_point, collision_thresh=0.01, voxel_size=0.01,
            batch_size=1, devices=1, max_frames=None, profile_dir=None,
        )
        test_app.inference(a, cfg)
        ge = GraspNetEval(root, camera="realsense", split="test_seen")
        res = ge.eval_scene("scene_0100", dump_dir)
        s = summarize(res)
        print(f"{tag}: AP {s['AP']:.2f} AP0.8 {s['AP0.8']:.2f} "
              f"AP0.4 {s['AP0.4']:.2f}")
        return s

    s_trained = dump_and_eval("trained", ckpt_path)
    s_random = dump_and_eval("random", None)

    result = {
        "metric": "learnability gate",
        "ap_trained": round(s_trained["AP"], 2),
        "ap_random": round(s_random["AP"], 2),
        "bar": args.bar,
        "steps": step,
        "train_s": round(train_s, 1),
        "dataset_gen_s": round(gen_s, 1),
        "final_loss": hist[-1][1],
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    ok = s_trained["AP"] >= args.bar and s_random["AP"] < args.bar
    if not args.keep and args.root is None and ok:
        shutil.rmtree(work, ignore_errors=True)
    if not ok:
        print(
            f"FAIL: need AP(trained) >= {args.bar} > AP(random); "
            f"got {s_trained['AP']:.2f} / {s_random['AP']:.2f}; "
            f"trajectory: {hist}"
        )
        return 1
    print("OK: learnability gate passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
