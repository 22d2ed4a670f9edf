"""Training entry point (equivalent of reference train.py).

Canonical invocation (mirrors command_train.sh):
    python -m graspnet_tpu.apps.train --dataset_root /data/graspnet \
        --camera realsense --log_dir logs/rs --batch_size 2 --max_epoch 18
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from graspnet_tpu import checkpoint
from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.data.dataset import DataLoader, GraspNetDataset, load_grasp_labels
from graspnet_tpu.parallel.mesh import make_mesh
from graspnet_tpu.train.trainer import Trainer, TrainConfig
from graspnet_tpu.utils.logging import MetricLogger


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_root", required=True)
    p.add_argument("--camera", default="kinect", choices=["kinect", "realsense"])
    p.add_argument("--checkpoint_path", default=None, help="resume checkpoint")
    p.add_argument("--log_dir", default="log")
    p.add_argument("--num_point", type=int, default=20000)
    p.add_argument("--num_view", type=int, default=300)
    p.add_argument("--max_epoch", type=int, default=18)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--bn_decay_step", type=int, default=2)
    p.add_argument("--bn_decay_rate", type=float, default=0.5)
    p.add_argument("--lr_decay_steps", default="8,12,16")
    p.add_argument("--lr_decay_rates", default="0.1,0.1,0.1")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--n_devices", type=int, default=None, help="data-parallel width")
    p.add_argument(
        "--candidate_devices", type=int, default=1,
        help="shard each scene's stage-2 candidate sweep (crop + heads + "
        "per-seed loss) over this many devices in addition to data "
        "parallelism — lets the batch-2 reference recipe use a full slice "
        "(total devices = data width x this; sync-BN and the optimizer "
        "step stay exact)",
    )
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument(
        "--profile_dir", default=None,
        help="capture an XLA device trace of train steps 10..15 here",
    )
    p.add_argument(
        "--tiny", action="store_true",
        help="scaled-down model config (smoke tests / CI)",
    )
    p.add_argument(
        "--num_objects", type=int, default=88,
        help="object label count (partial/mini datasets)",
    )
    p.add_argument(
        "--label_dtype", default="float32", choices=["float32", "bfloat16"],
        help="bfloat16 halves the per-step label transfer (full mode only)",
    )
    p.add_argument(
        "--debug_nans", action="store_true",
        help="enable jax_debug_nans: abort with a traceback at the first "
        "NaN-producing op instead of training on poisoned values",
    )
    p.add_argument(
        "--label_mode", default="compact", choices=["compact", "full"],
        help="compact = two-phase step shipping only matched label slabs "
        "(~100x less host->device traffic, bit-identical steps); full = "
        "ship the whole (Ns, V, A, D) slabs like the reference keeps on-device",
    )
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host: no-op unless GRASPNET_COORDINATOR / NUM_PROCESSES are set
    # (one process per host; XLA all-reduces ride ICI/DCN)
    from graspnet_tpu.parallel.distributed import initialize as dist_init

    multihost = dist_init()
    log_dir = args.log_dir
    if multihost:
        import jax

        if jax.process_index() != 0:
            # metrics are fully replicated; only process 0 writes the main
            # logs — secondaries get their own subdir for debug output
            log_dir = os.path.join(args.log_dir, f"proc{jax.process_index()}")
    os.makedirs(log_dir, exist_ok=True)
    logger = MetricLogger(log_dir)
    if multihost:
        import jax

        logger.log(
            f"multi-host runtime: process {jax.process_index()}/{jax.process_count()},"
            f" {len(jax.devices())} global devices"
        )

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    cfg = (
        GraspNetConfig.tiny()
        if args.tiny
        else GraspNetConfig(num_point=args.num_point, num_view=args.num_view)
    )
    tc = TrainConfig(
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        max_epoch=args.max_epoch,
        batch_size=args.batch_size,
        lr_decay_epochs=tuple(int(x) for x in args.lr_decay_steps.split(",")),
        lr_decay_rates=tuple(float(x) for x in args.lr_decay_rates.split(",")),
        bn_decay_step=args.bn_decay_step,
        bn_decay_rate=args.bn_decay_rate,
        label_dtype=args.label_dtype,
    )

    valid_objs, grasp_labels = load_grasp_labels(args.dataset_root, num_objects=args.num_objects)
    train_ds = GraspNetDataset(
        args.dataset_root, valid_objs, grasp_labels, camera=args.camera,
        split="train", num_points=cfg.num_point, remove_outlier=True,
        augment=True, cfg=cfg, label_mode=args.label_mode,
    )
    test_ds = GraspNetDataset(
        args.dataset_root, valid_objs, grasp_labels, camera=args.camera,
        split="test_seen", num_points=cfg.num_point, remove_outlier=True,
        augment=False, cfg=cfg, label_mode=args.label_mode,
    )
    logger.log(f"train len: {len(train_ds)}, test len: {len(test_ds)}")

    nproc, proc_id = 1, 0
    if multihost:
        import jax
        from graspnet_tpu.parallel.distributed import global_mesh

        nproc, proc_id = jax.process_count(), jax.process_index()
        assert tc.batch_size % nproc == 0, (
            f"process count {nproc} must divide the global batch {tc.batch_size}"
        )
        mesh = global_mesh()
        logger.log(
            f"data-parallel mesh: {len(jax.devices())} global device(s) over "
            f"{nproc} host(s); {tc.batch_size // nproc} scenes/host/step"
        )
    else:
        import jax

        cand = max(args.candidate_devices, 1)
        ndev = args.n_devices
        if ndev is None:
            # largest data width that divides the global batch — a batch
            # of 2 on an 8-device slice data-parallelizes over 2 devices
            # (add --candidate_devices to use the rest)
            avail = len(jax.devices()) // cand
            ndev = max(
                d
                for d in range(1, max(min(avail, tc.batch_size), 1) + 1)
                if tc.batch_size % d == 0
            )
        if cand > 1:
            mesh = make_mesh(
                ndev * cand, ("data", "candidate"), shape=(ndev, cand)
            )
            logger.log(
                f"hybrid mesh: {ndev} data x {cand} candidate device(s)"
            )
        else:
            mesh = make_mesh(ndev)
            logger.log(f"data-parallel mesh: {ndev} device(s)")
    trainer = Trainer(cfg=cfg, tc=tc, mesh=mesh)
    start_epoch = 0
    if args.checkpoint_path and os.path.exists(args.checkpoint_path):
        # restore WITH the live state as template: orbax otherwise returns
        # plain dicts/lists, losing the optax namedtuple opt_state structure
        from graspnet_tpu.parallel.mesh import replicate

        template = {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "epoch": np.int32(0),
        }
        state = checkpoint.restore(args.checkpoint_path, template=template)
        trainer.params = replicate(mesh, state["params"])
        trainer.opt_state = replicate(mesh, state["opt_state"])
        start_epoch = int(state["epoch"]) + 1
        logger.log(f"resumed from {args.checkpoint_path} at epoch {start_epoch}")

    # each host loads its slice of the global batch; identical shuffle seeds
    # + shard partition keep per-step global batches disjoint across hosts
    train_loader = DataLoader(
        train_ds, tc.batch_size // nproc, shuffle=True,
        num_workers=args.num_workers, num_shards=nproc, shard_index=proc_id,
    )
    test_loader = DataLoader(
        test_ds, tc.batch_size // nproc, shuffle=False,
        num_workers=args.num_workers, num_shards=nproc, shard_index=proc_id,
    )

    def save_checkpoint(epoch_done: int, tag: str = "checkpoint"):
        """Save full train state; resume restarts at epoch_done + 1."""
        if proc_id != 0:
            return
        state = {
            "params": trainer.params,
            "opt_state": trainer.opt_state,
            "epoch": np.int32(epoch_done),
        }
        if multihost:
            import jax

            state = jax.tree_util.tree_map(
                lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
                state,
            )
        checkpoint.save(os.path.join(os.path.abspath(args.log_dir), tag), state)
        logger.log(f"saved {tag} (resume epoch {epoch_done + 1})")

    # Preemption safety (TPU pods get preempted): on SIGTERM/SIGINT finish
    # the in-flight step, checkpoint at epoch-1 granularity (the current
    # epoch restarts on resume — steps are cheap, labels are resampled
    # per-epoch anyway), then exit cleanly.  The reference has no trainer
    # fault tolerance at all (SURVEY.md §5.3).
    import signal

    preempted = {"flag": False}

    def _on_preempt(signum, frame):
        # flag-only: logging here would re-enter the BufferedWriter if the
        # signal lands during a concurrent logger write (RuntimeError that
        # would kill training WITHOUT a checkpoint)
        preempted["flag"] = True

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _on_preempt)
        except ValueError:  # not the main thread (e.g. under a test runner)
            break

    # steps between cross-host preemption agreements: the allgather is a
    # host-blocking collective that would defeat async dispatch / label-prep
    # overlap if issued per step, and preemption grace periods are tens of
    # seconds, so agreeing every N steps loses nothing
    stop_check_every = 16

    def should_stop(step: int) -> bool:
        """Stop decision, agreed across processes.

        A signal can land at different step boundaries on different hosts;
        acting on the local flag alone would leave the others blocked in
        the next step's collectives.  All hosts share the same step counter,
        so they issue the (throttled) allgather on the same steps and the
        'any host flagged' decision is consistent.
        """
        if not multihost:
            return preempted["flag"]
        if step % stop_check_every != 0:
            return False
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray(preempted["flag"], np.int32)
        )
        return bool(np.asarray(flags).any())

    for epoch in range(start_epoch, tc.max_epoch):
        trainer.set_epoch(epoch)
        train_ds.set_epoch(epoch)  # fresh per-frame sampling/augmentation
        train_loader.set_epoch(epoch)  # global-epoch-pinned shuffle: hosts
        # agree on the permutation regardless of restarts / extra eval passes
        logger.log(f"**** EPOCH {epoch:03d} ****  lr={trainer.opt_state.hyperparams['learning_rate']}")
        t0 = time.time()
        # double buffering: dispatch the step, then start the NEXT batch's
        # host->device transfer while the step computes
        compact = args.label_mode == "compact"
        it = iter(train_loader)
        pending = (trainer.prepare if compact else trainer.put)(next(it))
        step = 0
        while pending is not None:
            if args.profile_dir and epoch == start_epoch:
                # steps 10..15: past compile + warmup, short enough to inspect
                import jax

                if step == 10:
                    jax.profiler.start_trace(args.profile_dir)
                elif step == 15:
                    jax.profiler.stop_trace()
                    logger.log(f"device trace saved to {args.profile_dir}")
            if compact:
                loss, metrics = trainer.step_prepared(pending)  # async dispatch
            else:
                loss, metrics = trainer.step(pending)
            try:
                # overlaps with the dispatched step's compute
                pending = (trainer.prepare if compact else trainer.put)(next(it))
            except StopIteration:
                pending = None
            logger.accumulate(metrics)  # blocks on this step's results
            step += 1
            if step % args.log_every == 0:
                logger.flush("train", epoch * len(train_loader) + step)
            if should_stop(step):
                save_checkpoint(epoch - 1, tag="checkpoint")
                logger.log("preemption checkpoint written; exiting")
                return
        # flush any train metrics accumulated since the last log_every
        # boundary — they must not bleed into the eval window below
        if step % args.log_every != 0:
            logger.flush("train", epoch * len(train_loader) + step)
        logger.log(f"epoch train time: {time.time()-t0:.1f}s")

        for batch in test_loader:
            _, metrics = (
                trainer.eval_step_compact(batch)
                if compact
                else trainer.eval_step(batch)
            )
            logger.accumulate(metrics)
        logger.flush("eval", (epoch + 1) * len(train_loader))

        # params/opt_state are fully replicated, so process 0 holds the
        # complete state (save_checkpoint no-ops on other processes)
        save_checkpoint(epoch)


if __name__ == "__main__":
    main()
