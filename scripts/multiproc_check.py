"""TRUE multi-process validation of the compact two-phase trainer path.

`tests/test_parallel.py` and `dryrun_multichip` exercise 8 virtual devices
in ONE process; the multi-process branches of Trainer.step_prepared
(addressable-shard ordering, global u_max allgather,
make_array_from_process_local_data feeding) only execute when
jax.process_count() > 1.  This script runs them for real:

  parent:   single-process reference — 8 virtual CPU devices, the full
            compact two-phase training loop on a deterministic global batch;
  children: 2 coordinator-connected processes x 4 virtual CPU devices each,
            the SAME global batch split into process-local halves, the same
            loop over the same 8-device global mesh.

What is asserted (and why not bitwise): the cross-process gloo all-reduce
does not guarantee the same float reduction order as the single-process
8-device all-reduce, and Adam amplifies 1-ulp gradient differences on
near-zero bias gradients into lr-scale parameter diffs (measured: losses
bitwise equal, biases off by ~1e-3 after one step, kernels by ~1e-9).

The tolerances are DERIVED from the run, not hardcoded: the parent repeats
its own loop with the batch order REVERSED — mathematically identical
(every batch reduction is symmetric) but a different scene -> device
assignment, so the same psum tree adds the same values in a different
order.  The per-leaf deviation between the two parent runs is a realized
sample of pure reduction-order noise, Adam amplification included; the
2-process run must agree with the parent within SAFETY x max(that probe,
the analytic worst-case re-ordering bound 2 (n_dev-1) eps_f32 max|leaf|).
A genuinely wrong reduction (dropped scene, double count, bad u_max
allgather) perturbs gradients by ~|g|/n_dev, orders above either term.

Prints one JSON verdict line.

Usage:
  python scripts/multiproc_check.py               # parent (runs everything)
  python scripts/multiproc_check.py --process_id I --coordinator H:P --out F
                                                  # child (spawned by parent)
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_GLOBAL = 8  # global batch == global device count
N_PROCESSES = 2
STEPS = 2


def _pin_cpu(n_devices: int) -> None:
    """Force the CPU backend with n virtual devices (pre-first-use)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)


def make_scene(cfg, scene_seed: int):
    """Deterministic compact-path scene keyed ONLY by scene_seed, so parent
    and children materialize identical global batches."""
    from graspnet_tpu.train import label_pipeline as lp

    rng = np.random.default_rng(scene_seed)
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth
    cloud = rng.uniform(-0.4, 0.4, (cfg.num_point, 3)).astype(np.float32)
    inds, seed_xyz = lp.seed_chain(cloud, cfg)
    poses, pts, scores, widths, tols = [], [], [], [], []
    for _ in range(2):
        q = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        poses.append(
            np.concatenate([q, rng.uniform(-0.2, 0.2, (3, 1)).astype(np.float32)], 1)
        )
        pts.append(rng.uniform(-0.05, 0.05, (24, 3)).astype(np.float32))
        scores.append(rng.uniform(0, 1.2, (24, v, a, d)).astype(np.float32))
        widths.append(rng.uniform(0, 0.15, (24, v, a, d)).astype(np.float32))
        tols.append(rng.uniform(0, 0.05, (24, v, a, d)).astype(np.float32))
    return {
        "point_clouds": cloud,
        "objectness_label": rng.integers(0, 2, cfg.num_point).astype(np.int32),
        "sa_inds": inds,
        "label_ctx": lp.prepare_scene_labels(
            seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
        ),
    }


def build_local_batch(cfg, step: int, lo: int, hi: int, order: int = 1):
    scenes = [make_scene(cfg, 10_000 * step + i) for i in range(lo, hi)][::order]
    batch = {}
    for k in scenes[0]:
        if k == "sa_inds":
            batch[k] = {s: np.stack([sc[k][s] for sc in scenes]) for s in scenes[0][k]}
        elif k == "label_ctx":
            batch[k] = [sc[k] for sc in scenes]
        else:
            batch[k] = np.stack([sc[k] for sc in scenes])
    return batch


def run_train(cfg, mesh, lo: int, hi: int, order: int = 1):
    import jax

    from graspnet_tpu.train.trainer import Trainer, TrainConfig

    trainer = Trainer(cfg=cfg, tc=TrainConfig(), mesh=mesh, seed=0)
    trainer.set_epoch(0)
    # gradient probe at the initial params (no state mutation)
    loss0, grads0 = trainer.grads_compact(build_local_batch(cfg, 0, lo, hi, order))
    losses = []
    for s in range(STEPS):
        loss, _ = trainer.step_compact(build_local_batch(cfg, s, lo, hi, order))
        losses.append(float(jax.device_get(loss)))
    return trainer, losses, float(jax.device_get(loss0)), jax.device_get(grads0)


def _save_results(path: str, trainer, losses, loss0, grads0) -> None:
    import jax

    out = {
        "losses": np.asarray(losses, np.float64),
        "loss0": np.float64(loss0),
    }
    for i, x in enumerate(jax.tree_util.tree_leaves(jax.device_get(trainer.params))):
        out[f"p{i}"] = np.asarray(x)
    for i, x in enumerate(jax.tree_util.tree_leaves(grads0)):
        out[f"g{i}"] = np.asarray(x)
    np.savez(path, **out)


def child_main(args) -> None:
    _pin_cpu(N_GLOBAL // N_PROCESSES)
    from graspnet_tpu.parallel import distributed

    distributed.initialize(args.coordinator, N_PROCESSES, args.process_id)
    import jax

    from graspnet_tpu.config import GraspNetConfig

    assert jax.process_count() == N_PROCESSES, jax.process_count()
    assert jax.local_device_count() == N_GLOBAL // N_PROCESSES
    assert jax.device_count() == N_GLOBAL
    cfg = GraspNetConfig.tiny()
    mesh = distributed.global_mesh()
    sl = distributed.process_local_batch_slice(N_GLOBAL)
    trainer, losses, loss0, grads0 = run_train(cfg, mesh, sl.start, sl.stop)
    if jax.process_index() == 0:
        _save_results(args.out, trainer, losses, loss0, grads0)


def parent_main(args) -> int:
    _pin_cpu(N_GLOBAL)
    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.parallel.mesh import make_mesh

    cfg = GraspNetConfig.tiny()
    trainer, losses, loss0, grads0 = run_train(cfg, make_mesh(N_GLOBAL), 0, N_GLOBAL)
    # DERIVED tolerance probe: the same loop with the batch order reversed is
    # mathematically identical (every reduction over the batch is symmetric)
    # but permutes the scene -> device assignment, so the psum tree adds the
    # same values in a different order.  Its deviation from the forward run
    # is a realized sample of pure reduction-order noise at this model /
    # batch / optimizer operating point — the same noise class that
    # separates the 2-process gloo reduction from the 1-process psum.
    trainer_r, losses_r, loss0_r, grads0_r = run_train(
        cfg, make_mesh(N_GLOBAL), 0, N_GLOBAL, order=-1
    )
    with tempfile.TemporaryDirectory() as tmp:
        ref_path = os.path.join(tmp, "ref.npz")
        _save_results(ref_path, trainer, losses, loss0, grads0)
        rev_path = os.path.join(tmp, "rev.npz")
        _save_results(rev_path, trainer_r, losses_r, loss0_r, grads0_r)

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        out = os.path.join(tmp, "mp.npz")
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)  # children pin their own device count
        procs = [
            subprocess.Popen(
                [
                    sys.executable, os.path.abspath(__file__),
                    "--process_id", str(i),
                    "--coordinator", f"127.0.0.1:{port}",
                    "--out", out,
                ],
                env=env,
                cwd=REPO,
            )
            for i in range(N_PROCESSES)
        ]
        codes = [p.wait(timeout=args.timeout) for p in procs]
        if any(codes):
            print(json.dumps({"ok": False, "error": f"child exit codes {codes}"}))
            return 1

        ref = np.load(ref_path)
        rev = np.load(rev_path)
        got = np.load(out)

        # Per-leaf tolerance DERIVED from this run, not hardcoded:
        #   SAFETY * max(probe, analytic) + atol floor, where
        #   probe    = |forward-order run - reversed-order run| for the leaf
        #              (realized reduction-order noise, see above), and
        #   analytic = 2 * (n_dev - 1) * eps_f32 * max|g| (the worst-case
        #              bound for re-ordering an n_dev-addend f32 sum with
        #              no cancellation, |fl(sum) - sum| <= (n-1) eps sum|x|,
        #              applied with sum|x| ~ max|leaf|).
        # A wrong reduction (dropped scene, double count, bad u_max
        # allgather) perturbs gradients by O(1/n_dev * |g|), orders above.
        SAFETY = 16.0
        EPS32 = 2.0 ** -24

        def leaf_keys(prefix):
            return [k for k in ref.files if k.startswith(prefix) and k[1:].isdigit()]

        def derived_check(prefix):
            worst_ratio, worst_diff, worst_tol = 0.0, 0.0, 0.0
            for k in leaf_keys(prefix):
                if not ref[k].size:
                    continue
                a = ref[k].astype(np.float64)
                b = got[k].astype(np.float64)
                probe = float(np.max(np.abs(a - rev[k].astype(np.float64))))
                analytic = 2.0 * (N_GLOBAL - 1) * EPS32 * float(np.max(np.abs(a)))
                tol = SAFETY * max(probe, analytic) + 1e-9
                diff = float(np.max(np.abs(a - b)))
                if diff / tol > worst_ratio:
                    worst_ratio, worst_diff, worst_tol = diff / tol, diff, tol
            return worst_ratio <= 1.0, worst_diff, worst_tol, worst_ratio

        g_ok, g_diff, g_tol, g_ratio = derived_check("g")
        p_ok, p_diff, p_tol, p_ratio = derived_check("p")
        loss_probe = abs(float(ref["loss0"]) - float(rev["loss0"]))
        loss_tol = SAFETY * max(
            loss_probe, 2.0 * (N_GLOBAL - 1) * EPS32 * abs(float(ref["loss0"]))
        ) + 1e-9
        loss0_ok = abs(float(ref["loss0"]) - float(got["loss0"])) <= loss_tol
        losses_ok = bool(
            np.all(
                np.abs(ref["losses"] - got["losses"])
                <= SAFETY * np.maximum(np.abs(ref["losses"] - rev["losses"]),
                                       EPS32 * np.abs(ref["losses"])) + 1e-9
            )
        )
        ok = bool(g_ok and p_ok and loss0_ok and losses_ok)
        verdict = {
            "ok": ok,
            "loss0_ok": bool(loss0_ok),
            "losses_ok": losses_ok,
            "grads_ok": bool(g_ok),
            "params_ok": bool(p_ok),
            "max_abs_grad_diff": g_diff,
            "derived_grad_tol": g_tol,
            "grad_tol_ratio": g_ratio,
            "max_abs_param_diff": p_diff,
            "derived_param_tol": p_tol,
            "param_tol_ratio": p_ratio,
            "derived_loss0_tol": loss_tol,
            "order_probe_loss0_diff": loss_probe,
            "param_leaves": len(leaf_keys("p")),
            "steps": STEPS,
            "safety_factor": SAFETY,
            "ref_losses": [float(x) for x in ref["losses"]],
            "mp_losses": [float(x) for x in got["losses"]],
            "processes": N_PROCESSES,
            "devices_per_process": N_GLOBAL // N_PROCESSES,
        }
        print(json.dumps(verdict))
        return 0 if ok else 1


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--coordinator", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--timeout", type=float, default=600.0)
    args = p.parse_args()
    if args.process_id is None:
        return parent_main(args)
    child_main(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
