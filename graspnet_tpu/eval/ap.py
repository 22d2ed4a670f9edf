"""GraspNet AP evaluation over dumped per-frame grasp arrays.

Implements the published GraspNet-1Billion protocol (the surface the
reference consumes via graspnetAPI.GraspNetEval, test.py:110-114):

  per frame: take the top-50 dumped grasps by score; reject grasps that
  collide with the scene's composed model clouds; associate each survivor
  with the nearest object model; score it by minimal force-closure friction
  mu*; at friction mu a grasp is a true positive iff mu* <= mu.

  Precision@k(mu) over k = 1..50, AP_mu = mean_k, AP = mean over
  mu in {0.2, ..., 1.2}.  eval_all returns per-scene, per-frame AP_mu arrays
  (shape [scenes, 256, 6]) like graspnetAPI, plus the scalar AP.

Object models load from root/models/{id:03d}/ as nontextured.ply or
cloud.npz; normals are PCA-estimated once per object and cached.
"""

from __future__ import annotations

import concurrent.futures as cf
import os

from typing import Dict, List, Optional, Tuple

import numpy as np

from graspnet_tpu.data.dataset import SPLITS
from graspnet_tpu.eval.force_closure import FRICTIONS, estimate_normals, grasp_scores
from graspnet_tpu.postproc import GraspGroup, ModelFreeCollisionDetector
from graspnet_tpu.postproc.voxel import voxel_down_sample

TOP_K = 50


# --------------------------------------------------------------- models ----


def load_ply_points(path: str) -> np.ndarray:
    """Minimal PLY vertex reader (ascii + binary_little_endian)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="ignore").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        n_vertex = int(next(l.split()[-1] for l in header if l.startswith("element vertex")))
        props = []
        in_vertex = False
        for l in header:
            if l.startswith("element"):
                in_vertex = l.startswith("element vertex")
            elif l.startswith("property") and in_vertex:
                props.append(tuple(l.split()[1:3]))  # (type, name)
        if fmt == "ascii":
            rows = np.loadtxt(f, max_rows=n_vertex, dtype=np.float64)
            names = [name for _, name in props]
            ix = [names.index(c) for c in ("x", "y", "z")]
            return rows[:, ix].astype(np.float32)
        np_types = {
            "float": "<f4", "float32": "<f4", "double": "<f8",
            "uchar": "u1", "uint8": "u1", "int": "<i4",
            "int32": "<i4", "uint": "<u4", "ushort": "<u2", "short": "<i2",
        }
        dt = np.dtype([(name, np_types[t]) for t, name in props])
        arr = np.frombuffer(f.read(n_vertex * dt.itemsize), dtype=dt, count=n_vertex)
        return np.stack(
            [arr["x"], arr["y"], arr["z"]], axis=1
        ).astype(np.float32)


def load_model_cloud(root: str, obj_id: int, voxel_size: float = 0.008) -> np.ndarray:
    """Load + downsample an object model cloud."""
    base = os.path.join(root, "models", f"{obj_id:03d}")
    npz = os.path.join(base, "cloud.npz")
    if os.path.exists(npz):
        pts = np.load(npz)["points"].astype(np.float32)
    else:
        ply = os.path.join(base, "nontextured.ply")
        pts = load_ply_points(ply)
    return voxel_down_sample(pts, voxel_size)


# ------------------------------------------------------------- protocol ----


def precision_at_k(
    scores: np.ndarray, positive: np.ndarray, top_k: int = TOP_K
) -> np.ndarray:
    """Precision@k curve for one friction level.

    scores: (M,) predicted grasp confidences (already sorted desc by caller or
    not — we sort here); positive: (M,) bool ground-truth at this friction.
    Frames with fewer than top_k grasps pad with negatives (missing grasps
    count against precision, as in the official protocol).
    """
    order = np.argsort(-scores, kind="stable")[:top_k]
    pos = positive[order].astype(np.float32)
    pos = np.pad(pos, (0, top_k - len(pos)))
    cum = np.cumsum(pos)
    return cum / np.arange(1, top_k + 1)


def eval_frame(
    grasps: np.ndarray,
    model_clouds: List[np.ndarray],
    model_normals: List[np.ndarray],
    poses: List[np.ndarray],
    collision_thresh: float = 0.25,
    voxel_size: float = 0.008,
    apply_nms: bool = True,
) -> np.ndarray:
    """AP_mu vector (len(FRICTIONS),) for one frame.

    grasps: (M, 17) dumped array (camera frame). poses: per-object (3, 4)
    model->camera transforms.  Grasp NMS (0.03 m / 30°) runs before the
    top-50 cut, per the GraspNet-1Billion protocol ("top 50 grasps after
    non-maximum suppression"); pass apply_nms=False to score raw dumps.
    """
    if len(grasps) == 0:
        return np.zeros(len(FRICTIONS), dtype=np.float32)
    if apply_nms:
        from graspnet_tpu.postproc.nms import grasp_nms

        grasps = grasps[grasp_nms(grasps)]  # returns desc-score order
    order = np.argsort(-grasps[:, 0], kind="stable")[:TOP_K]
    g = grasps[order]

    # compose scene cloud from posed models; collision rejection
    posed = [pts @ p[:3, :3].T + p[:3, 3] for pts, p in zip(model_clouds, poses)]
    scene = np.concatenate(posed, axis=0)
    det = ModelFreeCollisionDetector(scene, voxel_size=voxel_size)
    collision = det.detect(GraspGroup(g), approach_dist=0.05, collision_thresh=collision_thresh)

    # associate grasps to nearest model (by center distance to model cloud)
    centers = g[:, 13:16]
    nearest_obj = np.zeros(len(g), dtype=np.int32)
    best = np.full(len(g), np.inf)
    for oi, pts in enumerate(posed):
        step = 8192
        dmin = np.full(len(g), np.inf)
        for s in range(0, len(pts), step):
            d = np.linalg.norm(centers[:, None, :] - pts[None, s : s + step, :], axis=-1)
            dmin = np.minimum(dmin, d.min(axis=1))
        upd = dmin < best
        best = np.where(upd, dmin, best)
        nearest_obj[upd] = oi

    # force-closure score per grasp against its object (in model frame)
    mu_star = np.full(len(g), np.inf, dtype=np.float32)
    for oi in range(len(posed)):
        sel = np.nonzero(nearest_obj == oi)[0]
        if len(sel) == 0:
            continue
        # transform grasps into the model frame: R_m = P^T R, t_m = P^T (t - p)
        P, tp = poses[oi][:3, :3], poses[oi][:3, 3]
        gm = g[sel].copy()
        gm[:, 13:16] = (gm[:, 13:16] - tp) @ P
        R = gm[:, 4:13].reshape(-1, 3, 3)
        gm[:, 4:13] = np.einsum("ij,njk->nik", P.T, R).reshape(-1, 9)
        s = grasp_scores(model_clouds[oi], model_normals[oi], gm)
        mu_star[sel] = np.where(s > 0, 1.1 - s, np.inf)

    ap_mu = np.zeros(len(FRICTIONS), dtype=np.float32)
    for fi, mu in enumerate(FRICTIONS):
        positive = (~collision) & (mu_star <= mu + 1e-6)
        ap_mu[fi] = precision_at_k(g[:, 0], positive).mean()
    return ap_mu


def _eval_worker_init():
    """Pin spawned eval workers to the CPU backend (set before jax import).

    Unconditional, not setdefault: the parent environment often exports
    JAX_PLATFORMS (e.g. 'tpu'), and a worker inheriting it would fight the
    parent for the exclusive accelerator lock — workers never need one."""
    os.environ["JAX_PLATFORMS"] = "cpu"


class GraspNetEval:
    """Evaluate a dump directory over a split (graspnetAPI surface)."""

    def __init__(self, root: str, camera: str = "kinect", split: str = "test_seen"):
        self.root = root
        self.camera = camera
        self.split = split
        self.scene_ids = [f"scene_{i:04d}" for i in SPLITS[split]]
        self._model_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _model(self, obj_id: int) -> Tuple[np.ndarray, np.ndarray]:
        if obj_id not in self._model_cache:
            pts = load_model_cloud(self.root, obj_id)
            self._model_cache[obj_id] = (pts, estimate_normals(pts))
        return self._model_cache[obj_id]

    def eval_scene(self, scene: str, dump_dir: str) -> np.ndarray:
        import scipy.io as scio

        base = os.path.join(self.root, "scenes", scene, self.camera)
        frame_files = sorted(os.listdir(os.path.join(dump_dir, scene, self.camera)))
        out = []
        for ff in frame_files:
            frame = int(os.path.splitext(ff)[0])
            grasps = np.load(os.path.join(dump_dir, scene, self.camera, ff))
            meta = scio.loadmat(os.path.join(base, "meta", f"{frame:04d}.mat"))
            obj_idxs = meta["cls_indexes"].flatten().astype(np.int32)
            poses = [meta["poses"][:, :, i] for i in range(len(obj_idxs))]
            clouds, normals = [], []
            for o in obj_idxs:
                pts, nrm = self._model(int(o) - 1)  # label ids are 1-based
                clouds.append(pts)
                normals.append(nrm)
            out.append(eval_frame(grasps, clouds, normals, poses))
        return np.stack(out) if out else np.zeros((0, len(FRICTIONS)), np.float32)

    def eval_all(self, dump_dir: str, proc: int = 8):
        scenes = [
            s
            for s in self.scene_ids
            if os.path.isdir(os.path.join(dump_dir, s, self.camera))
        ]
        if proc <= 1 or len(scenes) <= 1:
            results = [self.eval_scene(s, dump_dir) for s in scenes]
        else:
            # spawn (never fork): the caller typically just ran inference, so
            # the parent holds an initialized TPU backend — forked children
            # would inherit a fork-unsafe XLA runtime and fight over the
            # exclusive libtpu lock.  Fresh spawned workers pin themselves to
            # the CPU backend before importing jax.
            import multiprocessing as mp

            ctx = mp.get_context("spawn")
            with cf.ProcessPoolExecutor(
                min(proc, len(scenes)),
                mp_context=ctx,
                initializer=_eval_worker_init,
            ) as pool:
                results = list(
                    pool.map(self.eval_scene, scenes, [dump_dir] * len(scenes))
                )
        res = np.stack(results) if results else np.zeros((0, 0, len(FRICTIONS)))
        ap = float(res.mean()) if res.size else 0.0
        return res, ap
