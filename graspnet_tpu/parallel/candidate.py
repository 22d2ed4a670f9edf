"""Candidate-axis (intra-scene) and scene-axis (data) parallel inference.

The reference is strictly single-GPU (SURVEY.md §2.9).  On a TPU slice two
orthogonal scalings apply:

* **Scene/data parallelism** (`data_parallel_infer`): a batch of scenes
  shards over the mesh 'data' axis, params replicate — the throughput path
  for eval sweeps over the 190-scene test split.

* **Candidate parallelism** (`candidate_sharded_infer`): ONE scene's
  stage-2 candidate sweep (1024 seeds x 300 views x 12 angles x 4 depths —
  the "sequence axis" of this workload, SURVEY.md §2.9/§5.7) shards over
  the mesh axis instead.  Stage 1 (backbone + approach head) replicates:
  FPS and the SA neighborhoods need the whole cloud and cost a small
  fraction of the frame.  Stage 2 — cylinder crop against the full cloud,
  crop MLP, operation/tolerance heads, decode — is per-seed, so each
  device processes Ns/n seeds with zero cross-device traffic until the
  final all-gather of decoded (17,)-rows (inserted automatically by XLA
  when the sharded output is consumed).  This is the latency path for
  robot serving: the crop stage dominates the frame, and it scales
  linearly in devices over ICI.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graspnet_tpu.config import GraspNetConfig
from graspnet_tpu.models import heads
from graspnet_tpu.models.backbone import backbone_forward
from graspnet_tpu.models.graspnet import pred_decode


def _stage2_decode(
    crop_params, op_params, tol_params, crop_seed, input_xyz, crop_rot, view_xyz,
    objectness, cfg: GraspNetConfig,
):
    """Per-seed stage 2 + decode on a (B, ns_shard) block of seeds."""
    vp_features, _ = heads.crop_forward(
        crop_params, crop_seed, input_xyz, crop_rot, cfg, train=False
    )
    ep: Dict[str, Any] = {"fp2_xyz": crop_seed, "grasp_top_view_xyz": view_xyz,
                          "objectness_score": objectness}
    ep.update(heads.operation_forward(op_params, vp_features, cfg, train=False))
    ep.update(heads.tolerance_forward(tol_params, vp_features, cfg, train=False))
    return pred_decode(ep, cfg)


def candidate_sharded_infer(
    cfg: GraspNetConfig,
    mesh: Mesh,
    axis: str = "candidate",
    data_axis: str | None = None,
):
    """Build a jitted (params, cloud) -> (grasps, valid) with stage 2 sharded
    over `axis`.  cloud: (B, N, 3); Ns must divide by the axis size.

    With a 2-D mesh and `data_axis` set, scenes additionally shard over
    `data_axis` (hybrid: throughput across scenes, latency within each) —
    B must then divide by that axis size.
    """
    n = mesh.shape[axis]
    assert cfg.num_seed % n == 0, (
        f"num_seed {cfg.num_seed} not divisible by mesh axis '{axis}' size {n}"
    )

    seed_spec = P(data_axis, axis)
    cloud_spec = P(data_axis)  # scenes split over data_axis, points whole
    stage2 = shard_map(
        functools.partial(_stage2_decode, cfg=cfg),
        mesh=mesh,
        in_specs=(
            P(), P(), P(),
            seed_spec, cloud_spec, seed_spec, seed_spec, seed_spec,
        ),
        out_specs=(seed_spec, seed_spec),
        # the fused Pallas crop kernel's out_shape carries no varying-mesh-axes
        # annotation; skip vma checking (specs above pin the sharding anyway)
        check_vma=False,
    )

    @jax.jit
    def infer(params, cloud):
        seed_features, seed_xyz, ep = backbone_forward(
            params["backbone"], cloud, cfg, train=False
        )
        ap = heads.approach_forward(
            params["approach"], seed_xyz, seed_features, cfg, train=False
        )
        # pin stage-1 outputs: cloud replicated (or scene-split), per-seed
        # tensors split on the candidate axis
        rep = NamedSharding(mesh, cloud_spec)
        split = NamedSharding(mesh, seed_spec)
        input_xyz = jax.lax.with_sharding_constraint(ep["input_xyz"], rep)
        crop_seed = jax.lax.with_sharding_constraint(ep["fp2_xyz"], split)
        crop_rot = jax.lax.with_sharding_constraint(ap["grasp_top_view_rot"], split)
        view_xyz = jax.lax.with_sharding_constraint(ap["grasp_top_view_xyz"], split)
        objectness = jax.lax.with_sharding_constraint(ap["objectness_score"], split)
        return stage2(
            params["crop"], params["operation"], params["tolerance"],
            crop_seed, input_xyz, crop_rot, view_xyz, objectness,
        )

    return infer


def data_parallel_infer(cfg: GraspNetConfig, mesh: Mesh, axis: str = "data"):
    """Build a jitted (params, clouds) -> (grasps, valid) with the scene batch
    sharded over `axis` and params replicated — the eval-throughput path.
    clouds: (B, N, 3) with B divisible by the axis size."""

    @functools.partial(
        jax.jit,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(axis)),
        ),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    def infer(params, clouds):
        from graspnet_tpu.models.graspnet import graspnet_forward

        ep = graspnet_forward(params, clouds, cfg, train=False)
        return pred_decode(ep, cfg)

    return infer
