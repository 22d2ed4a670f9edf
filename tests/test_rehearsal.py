"""Real-artifact gate rehearsal (VERDICT r3 item #5).

`pytest -m real_artifacts` (tests/test_real_artifacts.py) holds the gates
that fire the day the published checkpoint-rs.tar / GraspNet-1B blobs land
(reference README.md:74-109).  They have never executed outside skips in
this environment — this rehearsal makes them run END TO END, today:

  1. fabricate a "published" checkpoint .tar with the reference's exact
     state-dict key set (tests/test_checkpoint.make_reference_state_dict at
     the full production config) and random trained-shaped values;
  2. write a mini GraspNet-1B layout on disk (tests/mini_dataset);
  3. produce a golden top-50 dump from the fabricated checkpoint on the
     real reference example frame (the gate then cross-checks against it);
  4. run the gate file in a subprocess with the GRASPNET_* env vars set,
     asserting every gate RUNS and PASSES — zero skips.

Rehearsal-scaled knobs (GRASPNET_EXPECT_FRAMES / GRASPNET_MIN_AP) default
to the real-artifact values in the gate file; only frame count and the
trained-model AP bar differ here, every code path is the real one.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest

from graspnet_tpu.config import GraspNetConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLE_DATA = os.environ.get(
    "GRASPNET_EXAMPLE_DATA", "/root/reference/doc/example_data"
)

torch = pytest.importorskip("torch")


@pytest.mark.slow
@pytest.mark.skipif(
    not os.path.exists(os.path.join(EXAMPLE_DATA, "color.png")),
    reason="reference example frame missing",
)
def test_real_artifact_gates_fire_and_pass(tmp_path):
    import jax

    from tests.mini_dataset import make_mini_dataset
    from tests.test_checkpoint import params_to_reference_state_dict

    from graspnet_tpu.models import init_graspnet

    cfg = GraspNetConfig()
    # a HEALTHY init inverse-mapped to the reference key set (raw-noise
    # weights explode through the BN chain and predict zero positives);
    # tilt the objectness logits the way training would — channel 1 of the
    # approach head's final conv is the positive class (heads.py:68)
    init = init_graspnet(jax.random.PRNGKey(0), cfg)
    sd = params_to_reference_state_dict(init)
    with torch.no_grad():
        sd["view_estimator.vpmodule.conv3.bias"][0] -= 2.0
        sd["view_estimator.vpmodule.conv3.bias"][1] += 2.0
    ckpt_path = str(tmp_path / "checkpoint-rs.tar")
    # exact reference save format (train.py:211-219)
    torch.save(
        {
            "model_state_dict": sd,
            "epoch": 17,
            "loss": 0.1,
            "optimizer_state_dict": {},
        },
        ckpt_path,
    )
    root = make_mini_dataset(
        str(tmp_path / "data"), camera="realsense", n_frames=2
    )

    # golden top-50: run the fabricated checkpoint over the example frame
    # exactly as the gate's fixture does (pre-NMS, no collision filter)
    from graspnet_tpu import checkpoint as ck
    from graspnet_tpu.apps.image_demo import load_frame
    from graspnet_tpu.apps.pipeline import GraspPipeline

    params = ck.load_torch_checkpoint(ckpt_path)
    pipe = GraspPipeline(params=params, cfg=cfg)
    scene_cloud = load_frame(EXAMPLE_DATA)
    sampled = pipe.sample_cloud(scene_cloud)
    gg = pipe.run(
        sampled, scene_cloud=scene_cloud, collision_thresh=-1.0,
        nms=False, top_k=50,
    )
    golden_path = str(tmp_path / "golden_top50.npy")
    np.save(golden_path, gg.grasp_group_array[:50])

    env = dict(
        os.environ,
        GRASPNET_CHECKPOINT=ckpt_path,
        GRASPNET_DATASET_ROOT=root,
        GRASPNET_GOLDEN_TOP50=golden_path,
        GRASPNET_EXAMPLE_DATA=EXAMPLE_DATA,
        GRASPNET_EXPECT_FRAMES="2",
        GRASPNET_MIN_AP="-1",  # random weights: finite AP, no quality bar
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [
            sys.executable, "-m", "pytest", "-m", "real_artifacts",
            "tests/test_real_artifacts.py", "-q", "-rs", "-p", "no:cacheprovider",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    tail = out.stdout[-4000:] + out.stderr[-2000:]
    assert out.returncode == 0, f"gates failed:\n{tail}"
    m = re.search(r"(\d+) passed", out.stdout)
    assert m, f"no pass summary:\n{tail}"
    assert int(m.group(1)) == 5, f"expected all 5 gates to run:\n{tail}"
    assert "skipped" not in out.stdout, f"a gate skipped:\n{tail}"
