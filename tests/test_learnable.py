"""Parity tests for the learnable dataset's physics label scorer.

data/learnable.py::score_candidates is a vectorized sweep of the SAME
gripper-volume + force-closure math the AP evaluator applies per grasp
(eval/ap.py::collision_and_empty + eval/force_closure.min_friction).
The learnability gate's meaning rests on that equivalence — if the label
physics drifted from the eval physics, "trained beats random" would
measure the drift, not the convention chain.  Here the vectorized scorer
is pinned candidate-by-candidate against a reference loop built from the
EVALUATOR'S own functions.
"""

import numpy as np
import pytest

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.data import learnable
from graspnet_tpu.eval.ap import collision_and_empty
from graspnet_tpu.eval.force_closure import estimate_normals, min_friction


@pytest.fixture(scope="module")
def sphere_world():
    rng = np.random.default_rng(3)
    own = learnable.sphere_surface(300, 0.02) + np.float32([0.0, 0.0, 0.5])
    other = learnable.sphere_surface(200, 0.015) + np.float32([0.06, 0.0, 0.5])
    normals = estimate_normals(own)
    return own, normals, np.concatenate([own, other], axis=0), rng


def _reference_loop(centers, rots, widths, depths, own, normals, scene):
    """Candidate-by-candidate verdicts via the EVALUATOR's own functions."""
    n = len(centers)
    mu = np.zeros(n, np.float32)
    coll_scene = np.zeros(n, bool)
    for i in range(n):
        row = np.zeros(17, np.float32)
        row[1], row[2], row[3] = widths[i], learnable.GRASP_HEIGHT, depths[i]
        row[4:13] = rots[i].reshape(9)
        row[13:16] = centers[i]
        c_own, empty, centroid = collision_and_empty(row[None], own)
        c_scn, _, _ = collision_and_empty(row[None], scene)
        coll_scene[i] = bool(c_scn[0])
        if c_own[0] or empty[0]:
            continue
        center_fc = centers[i] + rots[i] @ centroid[0]
        m = min_friction(
            own, normals, center_fc.astype(np.float32),
            rots[i][:, 1].astype(np.float32), float(widths[i]),
        )
        mu[i] = m if m > 0 else 0.0
    return mu, coll_scene


def test_score_candidates_matches_evaluator_primitives(sphere_world):
    own, normals, scene, rng = sphere_world
    n = 400
    # candidates around the own sphere: surface anchors, approach mostly
    # inward with random tilt, random widths/depths — a mix of feasible,
    # colliding, empty, and non-closing cases
    anchors = own[rng.integers(0, len(own), n)]
    toward = (np.float32([0.0, 0.0, 0.5]) - anchors)
    toward += rng.normal(0, 0.4, toward.shape).astype(np.float32)
    toward /= np.linalg.norm(toward, axis=1, keepdims=True)
    from graspnet_tpu.models import geometry

    rots = geometry.batch_viewpoint_params_to_matrix_np(
        toward, rng.uniform(0, np.pi, n).astype(np.float32)
    )
    widths = rng.uniform(0.01, 0.09, n).astype(np.float32)
    depths = rng.choice([0.01, 0.02, 0.03, 0.04], n).astype(np.float32)

    mu_vec, coll_vec = learnable.score_candidates(
        anchors, rots, widths, depths, own, normals, scene, chunk=64
    )
    mu_ref, coll_ref = _reference_loop(
        anchors, rots, widths, depths, own, normals, scene
    )
    np.testing.assert_array_equal(coll_vec, coll_ref)
    np.testing.assert_array_equal(mu_vec, mu_ref.astype(np.float32))
    # the mix must actually exercise every branch
    assert (mu_ref > 0).any() and (mu_ref == 0).any() and coll_ref.any()


def test_render_reproduces_sphere_surface():
    """Back-projecting the rendered depth must land on the sphere surfaces
    within the uint16-mm quantization (the same error class real GraspNet
    depth PNGs carry)."""
    from graspnet_tpu.data.camera import (
        CameraInfo, create_point_cloud_from_depth_image,
    )

    centers = np.array([[-0.03, 0.0, 0.5], [0.04, 0.02, 0.5]], np.float32)
    r = 0.015
    depth_m, seg = learnable.render_sphere_scene(centers, r)
    depth_u16 = np.round(depth_m * learnable.FACTOR_DEPTH).astype(np.uint16)
    cam = CameraInfo(
        learnable.W, learnable.H, learnable.FX, learnable.FY,
        learnable.CX, learnable.CY, learnable.FACTOR_DEPTH,
    )
    cloud = create_point_cloud_from_depth_image(depth_u16, cam, organized=True)
    for i, c in enumerate(centers):
        pts = cloud[seg == i + 1]
        assert len(pts) > 40, f"sphere {i} barely rendered: {len(pts)} px"
        d = np.linalg.norm(pts - c, axis=1)
        # 1 mm depth quantization maps to ~1.1 mm radial error worst-case
        assert np.abs(d - r).max() < 2.5e-3, np.abs(d - r).max()
    # background pixels exist and sit on the BG plane
    bg = cloud[seg == 0]
    assert np.abs(bg[:, 2] - learnable.BG_DEPTH).max() < 1e-3


def test_labels_on_disk_round_trip(tmp_path):
    """make_learnable_dataset writes loader-consumable labels whose
    feasible fraction and per-depth supervision structure hold (every
    depth bin must have trainable cells somewhere — the property that
    keeps pred_decode's argmax inside supervised territory)."""
    cfg = GraspNetConfig.tiny()
    root = learnable.make_learnable_dataset(
        str(tmp_path), cfg=cfg, n_train_frames=1, n_test_frames=1,
        num_label_points=24,
    )
    import os

    lab = np.load(os.path.join(root, "grasp_label", "000_labels.npz"))
    mu = lab["scores"]
    assert mu.shape == (24, cfg.num_view, cfg.num_angle, cfg.num_depth)
    feas = mu > 0
    assert 0.03 < feas.mean() < 0.6, feas.mean()
    # every depth bin supervised at some (point, view, angle)
    per_depth = feas.any(axis=(0, 1, 2))
    assert per_depth.all(), per_depth
    # tolerance mirrors feasibility
    tol = np.load(os.path.join(root, "tolerance", "000_tolerance.npy"))
    np.testing.assert_array_equal(tol > 0, feas)
