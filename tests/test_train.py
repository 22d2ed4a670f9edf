"""Loss parity (vs torch transcription) and trainer integration tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.train.loss import get_loss
from graspnet_tpu.train import label_pipeline as lp
from graspnet_tpu.train.trainer import (
    Trainer,
    TrainConfig,
    bn_momentum_at_epoch,
    lr_at_epoch,
)
from graspnet_tpu.parallel.mesh import make_mesh

torch = pytest.importorskip("torch")

THRESH_GOOD, THRESH_BAD = 0.7, 0.1
GRASP_MAX_WIDTH, GRASP_MAX_TOLERANCE = 0.1, 0.05


def torch_loss_oracle(ep):
    """Transcription of reference models/loss.py:22-132 in torch."""
    t = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in ep.items()}

    # objectness (loss.py:30-45); our layout (B,Ns,2) -> torch CE wants (B,2,Ns)
    obj_score = t["objectness_score"].permute(0, 2, 1)
    obj_label = torch.gather(t["objectness_label"], 1, t["fp2_inds"].long()).long()
    objectness_loss = torch.nn.CrossEntropyLoss(reduction="mean")(obj_score, obj_label)

    # view loss (loss.py:47-66)
    V = t["batch_grasp_view_label"].size(2)
    obj_mask = (obj_label > 0).unsqueeze(-1).repeat(1, 1, V)
    mse = torch.nn.MSELoss(reduction="none")(t["view_score"], t["batch_grasp_view_label"])
    view_loss = mse[obj_mask].mean()

    # grasp loss (loss.py:69-132); our pred layout (B,Ns,A,D)
    label = t["batch_grasp_label"]
    width = t["batch_grasp_width"]
    tol = t["batch_grasp_tolerance"]
    tgt_idx = torch.argmax(label, dim=2, keepdim=True)  # (B,Ns,1,D)
    tgt_label = torch.gather(label, 2, tgt_idx).squeeze(2)
    tgt_width = torch.gather(width, 2, tgt_idx).squeeze(2)
    tgt_tol = torch.gather(tol, 2, tgt_idx).squeeze(2)
    graspable = tgt_label > THRESH_BAD
    loss_mask = ((obj_label > 0).unsqueeze(-1) & graspable).float()
    denom = loss_mask.sum() + 1e-6

    def huber(x, delta=1.0):
        a = torch.abs(x)
        q = torch.clamp(a, max=delta)
        return 0.5 * q**2 + delta * (a - q)

    score_pred = torch.gather(t["grasp_score_pred"], 2, tgt_idx).squeeze(2)
    score_loss = (huber(score_pred - tgt_label) * loss_mask).sum() / denom

    angle_logits = t["grasp_angle_cls_pred"].permute(0, 3, 1, 2)  # -> (B,D,Ns,A)? no:
    # reference CE expects (B, A, Ns, D); ours is (B, Ns, A, D)
    angle_logits = t["grasp_angle_cls_pred"].permute(0, 2, 1, 3)  # (B, A, Ns, D)
    tgt_cls = tgt_idx.squeeze(2).long()  # (B, Ns, D)
    ce = torch.nn.CrossEntropyLoss(reduction="none")(angle_logits, tgt_cls)
    angle_loss = (ce * loss_mask).sum() / denom

    width_pred = torch.gather(t["grasp_width_pred"], 2, tgt_idx).squeeze(2)
    width_loss = (huber((width_pred - tgt_width) / GRASP_MAX_WIDTH) * loss_mask).sum() / denom
    tol_pred = torch.gather(t["grasp_tolerance_pred"], 2, tgt_idx).squeeze(2)
    tol_loss = (huber((tol_pred - tgt_tol) / GRASP_MAX_TOLERANCE) * loss_mask).sum() / denom

    grasp_loss = score_loss + angle_loss + width_loss + tol_loss
    return float(objectness_loss + view_loss + 0.2 * grasp_loss)


def random_end_points(rng, cfg, b=2, n=64):
    ns, v, a, d = cfg.num_seed, cfg.num_view, cfg.num_angle, cfg.num_depth
    f32 = np.float32
    return {
        "objectness_score": rng.normal(size=(b, ns, 2)).astype(f32),
        "objectness_label": rng.integers(0, 2, size=(b, n)).astype(np.int32),
        "fp2_inds": rng.integers(0, n, size=(b, ns)).astype(np.int32),
        "view_score": rng.normal(size=(b, ns, v)).astype(f32),
        "batch_grasp_view_label": rng.uniform(0, 1, size=(b, ns, v)).astype(f32),
        "batch_grasp_label": rng.uniform(0, 1, size=(b, ns, a, d)).astype(f32),
        "batch_grasp_width": rng.uniform(0, 0.15, size=(b, ns, a, d)).astype(f32),
        "batch_grasp_tolerance": rng.uniform(0, 0.05, size=(b, ns, a, d)).astype(f32),
        "grasp_score_pred": rng.normal(size=(b, ns, a, d)).astype(f32),
        "grasp_angle_cls_pred": rng.normal(size=(b, ns, a, d)).astype(f32),
        "grasp_width_pred": rng.normal(size=(b, ns, a, d)).astype(f32),
        "grasp_tolerance_pred": rng.normal(size=(b, ns, a, d)).astype(f32),
    }


def test_loss_matches_torch_oracle(rng):
    cfg = GraspNetConfig.tiny()
    ep = random_end_points(rng, cfg)
    want = torch_loss_oracle(ep)
    got, metrics = get_loss({k: jnp.asarray(v) for k, v in ep.items()}, cfg)
    np.testing.assert_allclose(float(got), want, rtol=1e-4)
    assert np.isfinite(float(metrics["loss/stage1_view_loss"]))


def make_batch(rng, cfg, b):
    from tests.test_labels import make_scene

    clouds, obj_labels, sa_tree, label_list = [], [], [], []
    for _ in range(b):
        cloud = rng.uniform(-0.4, 0.4, (cfg.num_point, 3)).astype(np.float32)
        inds, seed_xyz = lp.seed_chain(cloud, cfg)
        seed_xyz_scene, poses, pts, scores, widths, tols = make_scene(rng, cfg)
        labels = lp.build_scene_labels(
            cloud, seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
        )
        clouds.append(cloud)
        obj_labels.append(rng.integers(0, 2, size=cfg.num_point).astype(np.int32))
        sa_tree.append(inds)
        label_list.append(labels)

    batch = {k: np.stack([l[k] for l in label_list]) for k in label_list[0]}
    batch["point_clouds"] = np.stack(clouds)
    batch["objectness_label"] = np.stack(obj_labels)
    batch["sa_inds"] = {
        k: np.stack([s[k] for s in sa_tree])[..., : getattr(cfg, k).npoint]
        for k in ("sa1", "sa2", "sa3", "sa4")
    }
    return batch


class TestTrainer:
    @pytest.mark.slow
    def test_single_device_step_decreases_loss(self, rng):
        cfg = GraspNetConfig.tiny()
        trainer = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
        batch = make_batch(rng, cfg, b=2)
        trainer.set_epoch(0)
        losses = []
        for _ in range(5):
            loss, metrics = trainer.step(batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_data_parallel_8dev_matches_semantics(self, rng):
        cfg = GraspNetConfig.tiny()
        mesh = make_mesh(8)
        trainer = Trainer(cfg=cfg, tc=TrainConfig(), mesh=mesh, seed=0)
        batch = make_batch(rng, cfg, b=8)
        trainer.set_epoch(0)
        loss, metrics = trainer.step(batch)
        assert np.isfinite(float(loss))

    @pytest.mark.slow
    def test_weight_decay_never_touches_bn_running_stats(self, rng):
        # torch Adam(weight_decay) decays parameters, never running_mean/var
        # (they are buffers, not nn.Parameters) — the adamw mask must match
        from graspnet_tpu.train.trainer import weight_decay_mask

        cfg = GraspNetConfig.tiny()
        t0 = Trainer(cfg=cfg, tc=TrainConfig(weight_decay=0.0), seed=0)
        t1 = Trainer(cfg=cfg, tc=TrainConfig(weight_decay=0.5), seed=0)
        mask = weight_decay_mask(t0.params)
        assert mask["backbone"]["sa1"]["mlp"][0]["bn"]["mean"] is False
        assert mask["backbone"]["sa1"]["mlp"][0]["bn"]["var"] is False
        assert mask["backbone"]["sa1"]["mlp"][0]["bn"]["scale"] is True
        assert mask["backbone"]["sa1"]["mlp"][0]["kernel"] is True

        batch = make_batch(rng, cfg, b=2)
        for t in (t0, t1):
            t.set_epoch(0)
            t.step(batch)
        bn0 = t0.params["backbone"]["sa1"]["mlp"][0]["bn"]
        bn1 = t1.params["backbone"]["sa1"]["mlp"][0]["bn"]
        # running stats follow the same momentum blend regardless of decay
        np.testing.assert_array_equal(np.asarray(bn0["mean"]), np.asarray(bn1["mean"]))
        np.testing.assert_array_equal(np.asarray(bn0["var"]), np.asarray(bn1["var"]))
        # while actual parameters DO see the decay
        assert not np.allclose(
            np.asarray(t0.params["backbone"]["sa1"]["mlp"][0]["kernel"]),
            np.asarray(t1.params["backbone"]["sa1"]["mlp"][0]["kernel"]),
        )

    def test_bn_stats_updated(self, rng):
        cfg = GraspNetConfig.tiny()
        trainer = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
        before = np.asarray(
            trainer.params["backbone"]["sa1"]["mlp"][0]["bn"]["mean"]
        ).copy()
        batch = make_batch(rng, cfg, b=2)
        trainer.set_epoch(0)
        trainer.step(batch)
        after = np.asarray(trainer.params["backbone"]["sa1"]["mlp"][0]["bn"]["mean"])
        assert not np.allclose(before, after)


def test_schedules():
    tc = TrainConfig()
    assert lr_at_epoch(tc, 0) == pytest.approx(1e-3)
    assert lr_at_epoch(tc, 8) == pytest.approx(1e-4)
    assert lr_at_epoch(tc, 12) == pytest.approx(1e-5)
    assert lr_at_epoch(tc, 17) == pytest.approx(1e-6)
    assert bn_momentum_at_epoch(tc, 0) == pytest.approx(0.5)
    assert bn_momentum_at_epoch(tc, 2) == pytest.approx(0.25)
    assert bn_momentum_at_epoch(tc, 17) == pytest.approx(0.5 * 0.5**8, abs=1e-6) or \
        bn_momentum_at_epoch(tc, 17) == pytest.approx(0.001953125)


@pytest.mark.slow
def test_bfloat16_label_transfer(rng):
    """bf16 label slabs: half the payload, loss within bf16 tolerance of f32."""
    from graspnet_tpu.parallel.mesh import make_mesh

    cfg = GraspNetConfig.tiny()
    batch = make_batch(rng, cfg, 2)
    t32 = Trainer(cfg=cfg, tc=TrainConfig(), mesh=make_mesh(1), seed=0)
    t16 = Trainer(
        cfg=cfg, tc=TrainConfig(label_dtype="bfloat16"), mesh=make_mesh(1), seed=0
    )
    t32.set_epoch(0)
    t16.set_epoch(0)
    l32, _ = t32.step(dict(batch))
    l16, _ = t16.step(dict(batch))
    l32, l16 = float(np.asarray(l32)), float(np.asarray(l16))
    assert np.isfinite(l16)
    assert abs(l32 - l16) / max(abs(l32), 1e-6) < 0.02


@pytest.mark.slow
def test_put_then_step_device_batch(rng):
    """Double-buffer pattern: put() then step() on the device-resident batch."""
    from graspnet_tpu.parallel.mesh import make_mesh

    cfg = GraspNetConfig.tiny()
    batch = make_batch(rng, cfg, 2)
    tr = Trainer(cfg=cfg, tc=TrainConfig(), mesh=make_mesh(2), seed=0)
    tr.set_epoch(0)
    dev = tr.put(batch)
    l1, _ = tr.step(dev)
    l2, _ = tr.step(batch)  # host batch path still works
    assert np.isfinite(float(np.asarray(l1)))
    assert np.isfinite(float(np.asarray(l2)))


def make_compact_batch(rng, cfg, b):
    """Same scenes as make_batch but in compact (two-phase) representation."""
    from tests.test_labels import make_scene

    clouds, obj_labels, sa_tree, label_list, ctxs = [], [], [], [], []
    for _ in range(b):
        cloud = rng.uniform(-0.4, 0.4, (cfg.num_point, 3)).astype(np.float32)
        inds, seed_xyz = lp.seed_chain(cloud, cfg)
        _, poses, pts, scores, widths, tols = make_scene(rng, cfg)
        labels = lp.build_scene_labels(
            cloud, seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
        )
        ctx = lp.prepare_scene_labels(
            seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
        )
        clouds.append(cloud)
        obj_labels.append(rng.integers(0, 2, size=cfg.num_point).astype(np.int32))
        sa_tree.append(inds)
        label_list.append(labels)
        ctxs.append(ctx)

    full = {k: np.stack([l[k] for l in label_list]) for k in label_list[0]}
    full["point_clouds"] = np.stack(clouds)
    full["objectness_label"] = np.stack(obj_labels)
    full["sa_inds"] = {
        k: np.stack([s[k] for s in sa_tree])[..., : getattr(cfg, k).npoint]
        for k in ("sa1", "sa2", "sa3", "sa4")
    }
    compact = {
        "point_clouds": full["point_clouds"],
        "objectness_label": full["objectness_label"],
        "sa_inds": full["sa_inds"],
        "label_ctx": ctxs,
    }
    return full, compact


@pytest.mark.slow
def test_compact_two_phase_step_matches_full_step(rng):
    """step_compact == step: identical loss and identical params after 3 steps."""
    cfg = GraspNetConfig.tiny()
    full, compact = make_compact_batch(rng, cfg, 2)

    t_full = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    t_comp = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    t_full.set_epoch(0)
    t_comp.set_epoch(0)
    for _ in range(3):
        l1, m1 = t_full.step(full)
        l2, m2 = t_comp.step_compact(compact)
        assert float(np.asarray(l1)) == float(np.asarray(l2))

    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        t_full.params,
        t_comp.params,
    )
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


@pytest.mark.slow
def test_compact_matches_full_fuzz_seeds():
    """The bitwise compact==full invariant must hold across random scene
    geometries, not just one draw (label matching picks different views /
    objects per seed — each exercises different slab-gather paths)."""
    cfg = GraspNetConfig.tiny()
    for seed in (7, 23):
        r = np.random.default_rng(seed)
        full, compact = make_compact_batch(r, cfg, 2)
        t_full = Trainer(cfg=cfg, tc=TrainConfig(), seed=seed)
        t_comp = Trainer(cfg=cfg, tc=TrainConfig(), seed=seed)
        t_full.set_epoch(0)
        t_comp.set_epoch(0)
        l1, _ = t_full.step(full)
        l2, _ = t_comp.step_compact(compact)
        assert float(np.asarray(l1)) == float(np.asarray(l2)), f"seed={seed}"


@pytest.mark.slow
def test_compact_prepare_pipeline_overlap(rng):
    """prepare(next) while the current step is in flight (the app's loop)."""
    cfg = GraspNetConfig.tiny()
    _, compact = make_compact_batch(rng, cfg, 2)
    tr = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    tr.set_epoch(0)
    handle = tr.prepare(compact)
    losses = []
    for _ in range(2):
        loss, _ = tr.step_prepared(handle)
        handle = tr.prepare(compact)  # dispatched while step computes
        losses.append(float(np.asarray(loss)))
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_eval_compact_matches_full(rng):
    """eval_step_compact == eval_step: bitwise loss/metrics, <=10% of the
    full path's host->device label bytes (VERDICT round 1, next #8).

    A train step runs first so BN running stats are non-trivial — the eval
    stage-1 pre-pass must reproduce the running-stat (train=False) top-view
    indices, not the batch-stat ones the TRAIN pre-pass computes.
    """
    cfg = GraspNetConfig.tiny()
    full, compact = make_compact_batch(rng, cfg, 2)
    tr = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    tr.set_epoch(0)
    tr.step(dict(full))  # perturb params + BN running stats away from init

    l_full, m_full = tr.eval_step(dict(full))
    l_comp, m_comp = tr.eval_step_compact(compact)
    assert float(np.asarray(l_full)) == float(np.asarray(l_comp))
    for k in m_full:
        assert float(np.asarray(m_full[k])) == float(np.asarray(m_comp[k])), k

    # traffic: full path ships the (B, Ns, V, A, D) slabs; compact ships the
    # clouds + sa_inds pre-pass payload plus matched (B, Ns, A, D)-sized slabs
    def nbytes(tree):
        return sum(
            x.nbytes
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "nbytes")
        )

    full_bytes = nbytes(full)
    handle = tr.prepare(compact, train=False)
    matched = tr._finalize_batch(handle)
    compact_bytes = nbytes({"point_clouds": compact["point_clouds"],
                            "objectness_label": compact["objectness_label"],
                            "sa_inds": compact["sa_inds"]}) + nbytes(
        {k: v for k, v in matched.items() if k not in
         ("point_clouds", "objectness_label", "sa_inds")})
    assert compact_bytes <= 0.1 * full_bytes, (compact_bytes, full_bytes)


@pytest.mark.slow
def test_eval_step_uses_running_stat_bn(rng):
    """Reference eval epoch = net.eval(): BN running stats, label crops.

    With fresh params (running mean 0 / var 1) batch statistics differ from
    running statistics, so eval-mode loss must differ from train-mode loss on
    the same batch — pinning that _eval_step does not use batch-stat BN.
    """
    cfg = GraspNetConfig.tiny()
    batch = make_batch(rng, cfg, 2)
    tr = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    tr.set_epoch(0)
    dev = tr.put(batch)
    eval_loss, _ = tr.eval_step(dev)

    from graspnet_tpu.models import graspnet_forward
    from graspnet_tpu.train.loss import get_loss

    ep = graspnet_forward(tr.params, dev["point_clouds"], cfg, train=True, labels=dev)
    ep["objectness_label"] = dev["objectness_label"]
    train_loss, _ = get_loss(ep, cfg)
    assert float(np.asarray(eval_loss)) != float(np.asarray(train_loss))

    # and the eval crop source is the label points (is_training flag), so
    # labels must still be consumed: removing them changes the outcome
    ep2 = graspnet_forward(tr.params, dev["point_clouds"], cfg, train=False, labels=dev)
    ep2["objectness_label"] = dev["objectness_label"]
    loss2, _ = get_loss(ep2, cfg)
    assert float(np.asarray(eval_loss)) == float(np.asarray(loss2))


def test_adam_l2_matches_torch_coupled_weight_decay(rng):
    """adam_l2 == torch optim.Adam(weight_decay>0): the L2 term must enter
    the gradient BEFORE the moment estimates (coupled), not as adamw's
    decoupled post-scale decay (reference train.py:84)."""
    from graspnet_tpu.train.trainer import adam_l2
    import optax

    lr, wd = 1e-3, 0.05
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    grads_seq = [
        {
            "w": rng.normal(size=(4, 3)).astype(np.float32),
            "b": rng.normal(size=(3,)).astype(np.float32),
        }
        for _ in range(4)
    ]

    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    tx = adam_l2(lr, wd)
    state = tx.init(params)
    for g in grads_seq:
        updates, state = tx.update(
            {"w": jnp.asarray(g["w"]), "b": jnp.asarray(g["b"])}, state, params
        )
        params = optax.apply_updates(params, updates)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([tw, tb], lr=lr, weight_decay=wd)
    for g in grads_seq:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g["w"].copy())
        tb.grad = torch.from_numpy(g["b"].copy())
        opt.step()

    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), tb.detach().numpy(), atol=1e-6)


@pytest.mark.slow
def test_overfit_gate_tiny():
    """Overfit convergence gate (VERDICT r3 #6): fixed 4-frame dataset must
    reach loss < 4.0 AND objectness acc > 0.9 within 240 steps on the tiny
    config — catches slow gradient corruption the 12-step smoke cannot."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "overfit_gate.py"), "--tiny"],
        capture_output=True, text=True, env=env, cwd=repo, timeout=1500,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]


def test_stage1_query_idx_matches_in_step_recompute():
    """The ball-query indices stage 1 exports must be EXACTLY the ones the
    full step would recompute (they are parameter-independent): reuse may
    not move a single neighbor."""
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
    ))
    import multiproc_check as mp

    from graspnet_tpu.models.backbone import backbone_forward
    from graspnet_tpu.train.trainer import Trainer, TrainConfig

    cfg = GraspNetConfig.tiny()
    tr = Trainer(cfg=cfg, tc=TrainConfig(batch_size=2), seed=0)
    batch = mp.build_local_batch(cfg, 0, 0, 2)
    handle = tr.prepare(batch)
    qidx = handle[3]
    assert set(qidx) == {"sa1", "sa2", "sa3", "sa4"}
    # independent recompute through the backbone without reuse
    import jax
    import jax.numpy as jnp

    _, _, ep = backbone_forward(
        tr.params["backbone"], jnp.asarray(batch["point_clouds"]), cfg,
        train=True,
        sa_inds={k: jnp.asarray(v) for k, v in batch["sa_inds"].items()},
    )
    for k in qidx:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(qidx[k])),
            np.asarray(jax.device_get(ep["sa_query_idx"][k])),
            err_msg=k,
        )
