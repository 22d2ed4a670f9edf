"""Auto-firing gates for the published reference artifacts.

The published checkpoints (`checkpoint-rs.tar` / `checkpoint-kn.tar`,
reference README.md:74-83) and the GraspNet-1B dataset are not present in
this environment, so the north-star gates — bit-matched top-50 vs the
checkpoint and the AP-47.47 table (reference README.md:94-109,
test.py:89-114) — cannot fire here.  These tests ARE those gates: the day
the blobs land, point the env vars at them and run

    GRASPNET_CHECKPOINT=/path/checkpoint-rs.tar \
    GRASPNET_DATASET_ROOT=/data/graspnet \
    GRASPNET_GOLDEN_TOP50=/path/ref_top50.npy \
    pytest -m real_artifacts tests/test_real_artifacts.py

with zero new code.  Each test skips with a reason naming exactly which
path is missing.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.real_artifacts

CKPT = os.environ.get("GRASPNET_CHECKPOINT")
DATASET = os.environ.get("GRASPNET_DATASET_ROOT")
GOLDEN = os.environ.get("GRASPNET_GOLDEN_TOP50")
EXAMPLE_DATA = os.environ.get(
    "GRASPNET_EXAMPLE_DATA", "/root/reference/doc/example_data"
)
# Rehearsal knobs (tests/test_rehearsal.py): defaults are the REAL gate
# values for the published artifacts; the rehearsal run scales them to its
# fabricated checkpoint + mini dataset so every gate line executes.
EXPECT_FRAMES = int(os.environ.get("GRASPNET_EXPECT_FRAMES", "256"))
MIN_AP = float(os.environ.get("GRASPNET_MIN_AP", "5.0"))

needs_ckpt = pytest.mark.skipif(
    not (CKPT and os.path.exists(CKPT)),
    reason="GRASPNET_CHECKPOINT not set / file missing "
    f"(got {CKPT!r}): point it at the published checkpoint-rs.tar",
)
needs_dataset = pytest.mark.skipif(
    not (DATASET and os.path.isdir(DATASET)),
    reason="GRASPNET_DATASET_ROOT not set / dir missing "
    f"(got {DATASET!r}): point it at the GraspNet-1B root",
)
needs_example = pytest.mark.skipif(
    not os.path.exists(os.path.join(EXAMPLE_DATA, "color.png")),
    reason=f"example frame missing under {EXAMPLE_DATA!r} "
    "(reference doc/example_data)",
)


@pytest.fixture(scope="module")
def converted_params():
    from graspnet_tpu import checkpoint

    return checkpoint.load_torch_checkpoint(CKPT)


@needs_ckpt
class TestCheckpointConversion:
    def test_conversion_consumes_every_weight(self, converted_params):
        """Audit: converted pytree holds exactly the state dict's values
        (ignoring torch's num_batches_tracked counters)."""
        import jax
        import torch

        raw = torch.load(CKPT, map_location="cpu", weights_only=False)
        sd = raw.get("model_state_dict", raw)
        n_sd = sum(
            v.numel() for k, v in sd.items() if "num_batches_tracked" not in k
        )
        n_params = sum(
            np.asarray(x).size
            for x in jax.tree_util.tree_leaves(converted_params)
        )
        assert n_params == n_sd, (
            f"conversion lost/invented weights: pytree {n_params:,} vs "
            f"state dict {n_sd:,}"
        )

    def test_roundtrip_through_orbax(self, converted_params, tmp_path):
        import jax
        from graspnet_tpu import checkpoint

        path = str(tmp_path / "ckpt")
        checkpoint.save(path, {"params": converted_params})
        back = checkpoint.restore(path, {"params": converted_params})
        for a, b in zip(
            jax.tree_util.tree_leaves(converted_params),
            jax.tree_util.tree_leaves(back["params"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@needs_ckpt
@needs_example
class TestExampleFrame:
    """The reference demo frame through the converted checkpoint
    (reference image_demo.py pipeline; golden compare = SURVEY §7's
    'bit-matched top-50' gate)."""

    @pytest.fixture(scope="class")
    def top50(self, converted_params):
        from graspnet_tpu.apps.image_demo import load_frame
        from graspnet_tpu.apps.pipeline import GraspPipeline
        from graspnet_tpu.config import GraspNetConfig

        pipe = GraspPipeline(params=converted_params, cfg=GraspNetConfig())
        scene_cloud = load_frame(EXAMPLE_DATA)
        sampled = pipe.sample_cloud(scene_cloud)
        return pipe.run(
            sampled,
            scene_cloud=scene_cloud,
            collision_thresh=-1.0,
            nms=False,  # reference golden rows are pre-NMS sorted
            top_k=50,
        )

    def test_shape_and_ordering(self, top50):
        arr = top50.grasp_group_array
        assert arr.shape[1] == 17
        assert 0 < len(arr) <= 50, (
            "a trained checkpoint must find objectness-positive seeds on the "
            "reference example frame"
        )
        assert np.all(np.diff(arr[:, 0]) <= 1e-6), "rows must be score-sorted"
        assert np.all(arr[:, 1] <= 0.1 + 1e-6), "width clamp (loss_utils)"
        assert np.allclose(arr[:, 2], 0.02), "height contract (graspnet.py:88)"

    @pytest.mark.skipif(
        not (GOLDEN and os.path.exists(GOLDEN)),
        reason=f"GRASPNET_GOLDEN_TOP50 not set / file missing (got {GOLDEN!r}):"
        " point it at a (50, 17) .npy dumped by the reference torch impl",
    )
    def test_bit_match_vs_reference_dump(self, top50):
        golden = np.load(GOLDEN)
        ours = top50.grasp_group_array[: len(golden)]
        assert ours.shape == golden.shape
        np.testing.assert_allclose(ours, golden, atol=1e-4)


@needs_ckpt
@needs_dataset
class TestOneSceneAP:
    """Dump + AP-evaluate the first seen-split scene end-to-end — the
    smallest version of the README AP table run (reference test.py:89-114).
    A full-split run uses apps/test.py directly."""

    def test_scene_100_ap(self, converted_params, tmp_path):
        import argparse

        from graspnet_tpu.apps import test as test_app
        from graspnet_tpu.config import GraspNetConfig
        from graspnet_tpu.eval.ap import GraspNetEval, summarize

        args = argparse.Namespace(
            dataset_root=DATASET,
            camera="realsense",
            split="test_seen",
            checkpoint_path=CKPT,
            dump_dir=str(tmp_path / "dump"),
            num_point=20000,
            collision_thresh=0.01,
            voxel_size=0.01,
            batch_size=1,
            max_frames=EXPECT_FRAMES,  # scene_0100 only (256 frames/scene)
            profile_dir=None,
        )
        test_app.inference(args, GraspNetConfig())
        ge = GraspNetEval(DATASET, camera="realsense", split="test_seen")
        res = ge.eval_scene("scene_0100", str(tmp_path / "dump"))
        assert res.shape[0] == EXPECT_FRAMES, "expected all frames dumped"
        s = summarize(res)
        print(f"scene_0100 AP {s['AP']:.2f} AP0.8 {s['AP0.8']:.2f} "
              f"AP0.4 {s['AP0.4']:.2f}")
        assert np.isfinite(s["AP"]) and 0.0 <= s["AP"] <= 100.0
        # the checkpoint is a trained model: a scene-level AP of zero would
        # mean the dump or the evaluator is broken, not a weak model
        # (MIN_AP is -1 only under the rehearsal's random-weight checkpoint)
        assert s["AP"] > MIN_AP
