"""On-chip training smoke: 12 repeated steps on one fixed synthetic batch
must drive the loss down monotonically-ish.

The strongest cheap end-to-end check of the TPU train path (fused
query+gather+rotate grouping, fused batch-stats crop MLP + its custom VJP,
compact two-phase labels, Adam): a silently wrong gradient or BN statistic
stalls or diverges this immediately, while every per-kernel parity test
could still pass at its own tolerance.  Compile is shared with
scripts/bench_train.py via the persistent cache, so a warm run takes
seconds of device time.

    python scripts/tpu_train_smoke.py          # exit 0 iff loss descends
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import jax

    from graspnet_tpu.config import GraspNetConfig
    from graspnet_tpu.train.trainer import Trainer, TrainConfig
    from graspnet_tpu.utils.compile_cache import enable

    import multiproc_check as mp  # deterministic synthetic scenes

    enable()
    print(f"backend: {jax.default_backend()}")
    cfg = GraspNetConfig()
    trainer = Trainer(cfg=cfg, tc=TrainConfig(), seed=0)
    trainer.set_epoch(0)
    batch = mp.build_local_batch(cfg, 0, 0, 2)
    losses = []
    for _ in range(12):
        loss, _ = trainer.step_compact(batch)
        losses.append(float(jax.device_get(loss)))
    print("losses:", [round(x, 3) for x in losses])
    if not losses[-1] < losses[0] * 0.9:
        print("FAIL: loss did not descend")
        return 1
    print("OK: loss descends through the full TPU train path")
    return 0


if __name__ == "__main__":
    sys.exit(main())
