"""Per-stage device timings of the TRAIN step via the slope method.

Decomposes the `Trainer._train_step` device time (batch 2, 20k points,
compact labels — the bench_train.py operating point) into forward /
backward / optimizer / per-module pieces so optimization effort lands on
the actual hot stage.  Same slope harness as device_stage_times.py; the
pieces are diagnostic (XLA fuses across stage boundaries in the real step,
so they need not sum exactly to the whole).

Prints one line per stage and a final JSON summary to stdout; pass
--json PATH to also write the summary for PERF.md citation.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from slope_timing import dump_records, timeit  # noqa: E402


def build_compact_batch(cfg, B=2, seed=0):
    """Synthetic compact-loader batch at the reference operating point."""
    from graspnet_tpu.train import label_pipeline as lp

    rng = np.random.default_rng(seed)
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth

    def make_scene():
        poses, pts, scores, widths, tols = [], [], [], [], []
        for _ in range(8):
            npc = 300
            poses.append(
                np.hstack([np.eye(3), rng.uniform(-0.2, 0.2, (3, 1))]).astype(
                    np.float32
                )
            )
            pts.append(rng.uniform(-0.05, 0.05, (npc, 3)).astype(np.float32))
            scores.append(rng.uniform(0, 1, (npc, v, a, d)).astype(np.float32))
            widths.append(rng.uniform(0, 0.1, (npc, v, a, d)).astype(np.float32))
            tols.append(rng.uniform(0, 0.05, (npc, v, a, d)).astype(np.float32))
        return poses, pts, scores, widths, tols

    clouds = [
        rng.uniform(-0.4, 0.4, (cfg.num_point, 3)).astype(np.float32)
        for _ in range(B)
    ]
    ctxs, sa_tree = [], []
    for i in range(B):
        inds, seed_xyz = lp.seed_chain(clouds[i], cfg)
        sa_tree.append(inds)
        ctxs.append(
            lp.prepare_scene_labels(seed_xyz, *make_scene(), cfg, max_objects=8)
        )
    return {
        "point_clouds": np.stack(clouds),
        "objectness_label": np.stack(
            [rng.integers(0, 2, cfg.num_point).astype(np.int32) for _ in range(B)]
        ),
        "sa_inds": {
            k: np.stack([s[k] for s in sa_tree])[..., : getattr(cfg, k).npoint]
            for k in ("sa1", "sa2", "sa3", "sa4")
        },
        "label_ctx": ctxs,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, help="write summary JSON here")
    ap.add_argument(
        "--out", default=None,
        help="write the harness-standard {stage_ms} JSON here (perf_check)",
    )
    args = ap.parse_args()

    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.models import graspnet_forward
    from graspnet_tpu.models import heads
    from graspnet_tpu.models.backbone import backbone_forward
    from graspnet_tpu.train import label_pipeline
    from graspnet_tpu.train.loss import get_loss
    from graspnet_tpu.train.trainer import Trainer, TrainConfig
    from graspnet_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    cfg = GraspNetConfig()
    print(f"backend: {jax.default_backend()}")

    batch = build_compact_batch(cfg)
    trainer = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    trainer.set_epoch(0)
    db = trainer._finalize_batch(trainer.prepare(batch))
    params = trainer.params
    results = {}

    def rec(name, fn, *a):
        results[name] = timeit(name, fn, *a) * 1000

    pc = db["point_clouds"]
    rec("scan overhead baseline", lambda x: x + 1.0, pc)

    # ---- whole step pieces -------------------------------------------------
    def loss_only(pc_, p, d_):
        d_ = dict(d_, point_clouds=pc_)
        ep = graspnet_forward(p, pc_, cfg, train=True, labels=d_)
        ep["objectness_label"] = d_["objectness_label"]
        return get_loss(ep, cfg)[0]

    rec("forward-only loss (train mode)", loss_only, pc, params, db)

    def fwd_bwd(pc_, p, d_):
        return jax.value_and_grad(lambda q: loss_only(pc_, q, d_))(p)

    rec("forward+backward (value_and_grad)", fwd_bwd, pc, params, db)

    _, grads0 = jax.jit(fwd_bwd)(pc, params, db)

    def opt_update(pc_, g, o, p):
        up, o2 = trainer.tx.update(g, o, p)
        import optax

        return optax.apply_updates(p, up), o2

    rec("optimizer update (adam_l2)", opt_update, pc, grads0, trainer.opt_state, params)

    # ---- per-module forward / fwd+bwd --------------------------------------
    def bb_fwd(pc_, p, si):
        return backbone_forward(p["backbone"], pc_, cfg, train=True, sa_inds=si)[:2]

    rec("backbone fwd (train)", bb_fwd, pc, params, db["sa_inds"])

    def bb_fwd_bwd(pc_, p, si):
        def f(q):
            feats, sx, _ = backbone_forward(
                q["backbone"], pc_, cfg, train=True, sa_inds=si
            )
            return jnp.sum(feats) + jnp.sum(sx)

        return jax.value_and_grad(f)(p)

    rec("backbone fwd+bwd (train)", bb_fwd_bwd, pc, params, db["sa_inds"])

    # label-matched crop inputs, exactly like graspnet_forward's train branch
    matched = jax.jit(
        lambda d_: label_pipeline.process_matched_labels(d_, cfg)
    )(db)
    crop_seed = matched["batch_grasp_point"]
    crop_rot = matched["batch_grasp_view_rot"]

    rec(
        "label process_matched_labels",
        lambda pc_, d_: label_pipeline.process_matched_labels(
            dict(d_, point_clouds=pc_), cfg
        )["batch_grasp_point"],
        pc,
        db,
    )

    def crop_fwd(pc_, p, s, r):
        return heads.crop_forward(p["crop"], s, pc_, r, cfg, train=True)[0]

    rec("crop fwd (train, BN batch stats)", crop_fwd, pc, params, crop_seed, crop_rot)

    def crop_fwd_bwd(pc_, p, s, r):
        def f(q):
            out, _ = heads.crop_forward(q["crop"], s, pc_, r, cfg, train=True)
            return jnp.sum(out)

        return jax.value_and_grad(f)(p)

    rec("crop fwd+bwd (train)", crop_fwd_bwd, pc, params, crop_seed, crop_rot)

    vp = jax.jit(crop_fwd)(pc, params, crop_seed, crop_rot)

    def heads_fwd_bwd(vp_, p):
        def f(q):
            o1 = heads.operation_forward(q["operation"], vp_, cfg, train=True)
            o2 = heads.tolerance_forward(q["tolerance"], vp_, cfg, train=True)
            return jnp.sum(o1["grasp_score_pred"]) + jnp.sum(
                o2["grasp_tolerance_pred"]
            )

        return jax.value_and_grad(f)(p)

    rec("operation+tolerance fwd+bwd", heads_fwd_bwd, vp, params)

    feats = jnp.zeros((pc.shape[0], 1024, cfg.seed_feature_dim), jnp.float32)
    seeds = crop_seed[:, :, 0] if crop_seed.ndim == 4 else crop_seed

    def approach_fwd_bwd(f_, p, s):
        def f(q):
            ep = heads.approach_forward(q["approach"], s, f_, cfg, train=True)
            return jnp.sum(ep["view_score"]) + jnp.sum(ep["objectness_score"])

        return jax.value_and_grad(f)(p)

    rec("approach fwd+bwd", approach_fwd_bwd, feats, params, seeds)

    print(json.dumps({"train_stage_ms": {k: round(v, 3) for k, v in results.items()},
                      "backend": jax.default_backend()}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "train_stage_ms": {k: round(v, 3) for k, v in results.items()},
                    "backend": jax.default_backend(),
                    "source": "scripts/train_stage_times.py",
                },
                f,
                indent=1,
            )
    if args.out:
        dump_records(args.out, source="scripts/train_stage_times.py")


if __name__ == "__main__":
    main()
