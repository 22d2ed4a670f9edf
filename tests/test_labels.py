"""Label-pipeline parity: host+device halves vs a transcription of
reference utils/label_generation.py (process_grasp_labels +
match_grasp_view_and_label), on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import geometry
from graspnet_tpu.train import label_pipeline as lp

GRASP_MAX_WIDTH = 0.1


def _views_np(v):
    return geometry.generate_grasp_views_np(v)


def _view_rot_np(v):
    views = _views_np(v)
    return np.asarray(
        geometry.batch_viewpoint_params_to_matrix(
            jnp.asarray(-views), jnp.asarray(np.zeros(v, np.float32))
        )
    )


def reference_label_oracle(seed_xyz, poses, pts_list, scores_list, widths_list, tol_list, v, a, d, top_view_inds):
    """Direct numpy transcription of label_generation.py:18-151 for one scene."""
    views = _views_np(v)
    base_rots = _view_rot_np(v)

    merged_pts, merged_rot, merged_scores, merged_widths, merged_tol = [], [], [], [], []
    for pose, pts, scores, widths, tol in zip(poses, pts_list, scores_list, widths_list, tol_list):
        R, t = pose[:3, :3], pose[:3, 3]
        pts_trans = pts @ R.T + t
        views_trans = views @ R.T
        # view_inds: for each canonical view, nearest transformed view (:58-60)
        d2 = np.sum((views[:, None] - views_trans[None]) ** 2, axis=-1)
        view_inds = np.argmin(d2, axis=1)
        rot_trans = np.einsum("ij,vjk->vik", R, base_rots)[view_inds]  # (:55,:63)
        merged_pts.append(pts_trans)
        merged_rot.append(np.broadcast_to(rot_trans, (len(pts), v, 3, 3)))
        merged_scores.append(scores[:, view_inds])
        merged_widths.append(widths[:, view_inds])
        merged_tol.append(tol[:, view_inds])

    merged_pts = np.concatenate(merged_pts)
    merged_rot = np.concatenate(merged_rot)
    merged_scores = np.concatenate(merged_scores)
    merged_widths = np.concatenate(merged_widths)
    merged_tol = np.concatenate(merged_tol)

    # seed -> nearest label point (:84-94)
    d2 = np.sum((seed_xyz[:, None] - merged_pts[None]) ** 2, axis=-1)
    nn = np.argmin(d2, axis=1)
    g_pts = merged_pts[nn]
    g_rot = merged_rot[nn]
    g_scores = merged_scores[nn]
    g_widths = merged_widths[nn]
    g_tol = merged_tol[nn]
    return {
        "points": g_pts,
        "view_rot": g_rot,
        "scores": g_scores,
        "widths": g_widths,
        "tolerance": g_tol,
    }


def make_scene(rng, cfg, n_obj=3, np_obj=40):
    poses, pts_list, scores_list, widths_list, tol_list = [], [], [], [], []
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth
    for _ in range(n_obj):
        A = rng.normal(size=(3, 3))
        R = np.linalg.qr(A)[0].astype(np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        poses.append(np.concatenate([R, t[:, None]], axis=1))
        pts_list.append(rng.uniform(-0.05, 0.05, (np_obj, 3)).astype(np.float32))
        scores_list.append(rng.uniform(0, 1.2, (np_obj, v, a, d)).astype(np.float32))
        widths_list.append(rng.uniform(0, 0.15, (np_obj, v, a, d)).astype(np.float32))
        tol_list.append(rng.uniform(0, 0.05, (np_obj, v, a, d)).astype(np.float32))
    seed_xyz = rng.uniform(-0.4, 0.4, (cfg.num_seed, 3)).astype(np.float32)
    return seed_xyz, poses, pts_list, scores_list, widths_list, tol_list


def test_label_pipeline_matches_reference_oracle(rng):
    cfg = GraspNetConfig.tiny()
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth
    b = 2
    scenes = [make_scene(rng, cfg) for _ in range(b)]

    # --- our pipeline: host half ---
    host = [
        lp.build_scene_labels(
            None, s[0], s[1], s[2], s[3], s[4], s[5], cfg, max_objects=4
        )
        for s in scenes
    ]
    labels = {
        k: jnp.asarray(np.stack([h[k] for h in host])) for k in host[0]
    }

    # --- device half ---
    end_points = {}
    out = lp.process_grasp_labels(end_points, labels, cfg)

    # --- oracle ---
    oracle = [
        reference_label_oracle(s[0], s[1], s[2], s[3], s[4], s[5], v, a, d, None)
        for s in scenes
    ]
    raw_scores = np.stack([o["scores"] for o in oracle])  # (B, Ns, V, A, D)
    raw_widths = np.stack([o["widths"] for o in oracle])
    mask = (raw_scores > 0) & (raw_widths <= GRASP_MAX_WIDTH)
    u_max = raw_scores.max()
    want_label = np.where(mask, np.log(u_max / np.where(mask, raw_scores, 1.0)), 0.0)
    want_view_label = want_label.reshape(b, cfg.num_seed, v, a * d).max(-1)

    np.testing.assert_allclose(
        np.asarray(out["batch_grasp_point"]),
        np.stack([o["points"] for o in oracle]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["batch_grasp_view_rot"]),
        np.stack([o["view_rot"] for o in oracle]),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(out["batch_grasp_label"]), want_label, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["batch_grasp_view_label"]), want_view_label, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["batch_grasp_tolerance"]),
        np.stack([o["tolerance"] for o in oracle]),
        atol=1e-6,
    )

    # --- match at a random predicted top view (label_generation.py:129-151) ---
    top = rng.integers(0, v, size=(b, cfg.num_seed))
    end_points = dict(out)
    end_points["grasp_top_view_inds"] = jnp.asarray(top)
    matched = lp.match_grasp_view_and_label(end_points, cfg)
    for i in range(b):
        for s in [0, 5, cfg.num_seed - 1]:
            tv = top[i, s]
            np.testing.assert_allclose(
                np.asarray(matched["batch_grasp_label"][i, s]),
                want_label[i, s, tv],
                rtol=1e-5,
                atol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(matched["batch_grasp_view_rot"][i, s]),
                oracle[i]["view_rot"][s, tv],
                atol=1e-5,
            )


def test_fps_numpy_matches_jax_op(rng):
    from graspnet_tpu import ops

    pts = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
    want = np.asarray(ops.furthest_point_sample(pts[None], 64, use_pallas=False))[0]
    got = lp.fps_numpy(pts, 64)
    np.testing.assert_array_equal(got, want)


def test_seed_chain_shapes(rng):
    cfg = GraspNetConfig.tiny()
    cloud = rng.uniform(-0.5, 0.5, (cfg.num_point, 3)).astype(np.float32)
    inds, seed_xyz = lp.seed_chain(cloud, cfg)
    assert inds["sa1"].shape == (cfg.sa1.npoint,)
    assert inds["sa2"].shape == (cfg.sa2.npoint,)
    assert seed_xyz.shape == (cfg.sa2.npoint, 3)
    np.testing.assert_allclose(seed_xyz, cloud[inds["sa1"]][inds["sa2"]])


def test_compact_path_matches_full_path_bitwise(rng):
    """prepare/finalize + device rescale == build/process/match, bit for bit."""
    import jax.numpy as jnp

    cfg = GraspNetConfig.tiny()
    seed_xyz, poses, pts, scores, widths, tols = make_scene(rng, cfg)

    full = lp.build_scene_labels(
        None, seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
    )
    ctx = lp.prepare_scene_labels(
        seed_xyz, poses, pts, scores, widths, tols, cfg, max_objects=4
    )

    dev_labels = {k: jnp.asarray(v)[None] for k, v in full.items()}
    ep = lp.process_grasp_labels({}, dev_labels, cfg)
    u_max_full = float(jnp.max(dev_labels["grasp_labels"]))
    assert float(ctx.scene_umax) == u_max_full  # exact u_max reproduction

    top = rng.integers(0, cfg.num_view, cfg.num_seed).astype(np.int32)
    ep["grasp_top_view_inds"] = jnp.asarray(top)[None]
    matched = lp.match_grasp_view_and_label(ep, cfg)

    fin = lp.finalize_scene_labels(ctx, top, cfg)
    fin_b = {k: jnp.asarray(v)[None] for k, v in fin.items()}
    fin_b["label_u_max"] = jnp.float32(ctx.scene_umax)
    out = lp.process_matched_labels(fin_b, cfg)

    for k in (
        "batch_grasp_view_rot",
        "batch_grasp_label",
        "batch_grasp_width",
        "batch_grasp_tolerance",
        "batch_grasp_point",
    ):
        np.testing.assert_array_equal(
            np.asarray(out[k][0]), np.asarray(matched.get(k, ep.get(k))[0]), err_msg=k
        )
    np.testing.assert_array_equal(
        np.asarray(out["batch_grasp_view_label"][0]),
        np.asarray(ep["batch_grasp_view_label"][0]),
    )


def test_indexed_compact_matches_copy_compact_bitwise(rng):
    """Indexed ctx (row indices + cached masked stats over full arrays) ==
    copy-based ctx (pre-zeroed subsampled slabs), bit for bit — the round-4
    loader redesign must not move a single float."""
    from graspnet_tpu import native

    cfg = GraspNetConfig.tiny()
    v, a, d = cfg.num_view, cfg.num_angle, cfg.num_depth
    n_obj, np_full = 3, 60
    poses, objects = [], []
    pts_sub, scores_sub, widths_sub, tol_sub = [], [], [], []
    for _ in range(n_obj):
        A = rng.normal(size=(3, 3))
        R = np.linalg.qr(A)[0].astype(np.float32)
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        poses.append(np.concatenate([R, t[:, None]], axis=1))
        pts = rng.uniform(-0.05, 0.05, (np_full, 3)).astype(np.float32)
        scores = rng.uniform(0, 1.2, (np_full, v, a, d)).astype(np.float32)
        offsets = rng.uniform(0, 0.15, (np_full, v, a, d, 3)).astype(np.float32)
        tol = rng.uniform(0, 0.05, (np_full, v, a, d)).astype(np.float32)
        coll = rng.random((np_full, v, a, d)) < 0.2
        widths = offsets[..., 2]  # strided view, like the dataset's
        # visibility + subsample -> row indices (the dataset's new path)
        vis_ids = np.flatnonzero(rng.random(np_full) < 0.8)
        rows = vis_ids[rng.choice(len(vis_ids), 30, replace=False)]
        lmin, has, vmax = native.label_view_stats_masked(
            scores, widths, coll, cfg.grasp_max_width
        )
        objects.append(
            dict(rows=rows, points=pts, scores=scores, widths=widths,
                 tol=tol, coll=coll, lmin=lmin, has=has, vmax=vmax)
        )
        # copy path: zero AFTER subsampling, like the old dataset loop
        s = scores[rows].copy()
        tl = tol[rows].copy()
        c = coll[rows]
        s[c] = 0.0
        tl[c] = 0.0
        pts_sub.append(pts[rows])
        scores_sub.append(s)
        widths_sub.append(np.ascontiguousarray(widths[rows]))
        tol_sub.append(tl)

    seed_xyz = rng.uniform(-0.4, 0.4, (cfg.num_seed, 3)).astype(np.float32)
    ctx_old = lp.prepare_scene_labels(
        seed_xyz, poses, pts_sub, scores_sub, widths_sub, tol_sub, cfg,
        max_objects=4,
    )
    ctx_new = lp.prepare_scene_labels_indexed(
        seed_xyz, poses, objects, cfg, max_objects=4
    )
    assert float(ctx_new.scene_umax) == float(ctx_old.scene_umax)
    np.testing.assert_array_equal(ctx_new.seed_obj, ctx_old.seed_obj)
    np.testing.assert_array_equal(ctx_new.grasp_points, ctx_old.grasp_points)

    top = rng.integers(0, v, cfg.num_seed).astype(np.int32)
    fin_old = lp.finalize_scene_labels(ctx_old, top, cfg)
    fin_new = lp.finalize_scene_labels(ctx_new, top, cfg)
    assert set(fin_old) == set(fin_new)
    for k in fin_old:
        np.testing.assert_array_equal(fin_new[k], fin_old[k], err_msg=k)
