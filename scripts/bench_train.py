"""Training-step benchmark at the reference operating point.

Reference recipe: batch 2, 20k-point clouds, 1024 seeds x 300 views x 12
angles x 4 depths (train.py:31-40).  Reports the device step time and the
end-to-end pipelined step time of the compact two-phase label path
(Trainer.prepare/step_prepared), plus the host label-prep cost per scene.

Prints one JSON line; run on the TPU chip (or JAX_PLATFORMS=cpu for a
functional check).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.train import label_pipeline as lp
    from graspnet_tpu.train.trainer import Trainer, TrainConfig

    cfg = GraspNetConfig()
    rng = np.random.default_rng(0)
    B = 2
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
    scenes = [make_scene() for _ in range(B)]  # synthetic data gen NOT timed
    t0 = time.perf_counter()
    ctxs, sa_tree = [], []
    for i in range(B):
        inds, seed_xyz = lp.seed_chain(clouds[i], cfg)
        sa_tree.append(inds)
        ctxs.append(lp.prepare_scene_labels(seed_xyz, *scenes[i], cfg, max_objects=8))
    host_prep_ms = (time.perf_counter() - t0) / B * 1000

    batch = {
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

    trainer = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    trainer.set_epoch(0)
    t0 = time.perf_counter()
    loss, _ = trainer.step_compact(batch)
    jax.device_get(loss)
    compile_s = time.perf_counter() - t0

    # warm past autotuning / first-execution overheads before timing
    for _ in range(4):
        loss, _ = trainer.step_compact(batch)
    jax.device_get(loss)

    # pipelined (the apps/train.py loop pattern)
    handle = trainer.prepare(batch)
    k = 10
    t0 = time.perf_counter()
    for _ in range(k):
        loss, _ = trainer.step_prepared(handle)
        handle = trainer.prepare(batch)
    jax.device_get(loss)
    step_ms = (time.perf_counter() - t0) / k * 1000

    # device-only step time via the slope method (chained async dispatches,
    # one sync) — robust to the tunneled backend's ~26 ms RPC floor and to
    # shared-host noise, which dominate the end-to-end number above
    import jax.numpy as jnp
    from graspnet_tpu.train.label_pipeline import finalize_scene_labels

    device_small, ctxs2, top, qidx, _static = trainer.prepare(batch)
    top_np = np.asarray(jax.device_get(top))
    matched = [
        finalize_scene_labels(c, top_np[i], cfg) for i, c in enumerate(ctxs2)
    ]
    labels = {k2: np.stack([m[k2] for m in matched]) for k2 in matched[0]}
    labels["label_u_max"] = np.float32(max(c.scene_umax for c in ctxs2))
    # shard_batch directly, exactly like Trainer.step_prepared — trainer.put
    # would bf16-cast the label slabs under tc.label_dtype='bfloat16' and
    # time a program the compact path never runs
    from graspnet_tpu.parallel.mesh import shard_batch

    db = dict(device_small)
    db.update(shard_batch(trainer.mesh, labels))
    if qidx:
        db["sa_query_idx"] = qidx
    mom = jnp.float32(0.5)
    times = {}
    for kk in (4, 24):
        p, o = trainer.params, trainer.opt_state
        t0 = time.perf_counter()
        for _ in range(kk):
            p, o, loss, _ = trainer._train_step(p, o, db, mom)
        jax.device_get(loss)
        times[kk] = time.perf_counter() - t0
    device_step_ms = (times[24] - times[4]) / 20 * 1000

    print(
        json.dumps(
            {
                "metric": "train step (batch 2, 20k pts, compact labels)",
                "value": round(step_ms, 1),
                "unit": "ms/step",
                "device_step_ms": round(device_step_ms, 1),
                "host_label_prep_ms_per_scene": round(host_prep_ms, 1),
                "compile_s": round(compile_s, 1),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
