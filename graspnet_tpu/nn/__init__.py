"""Minimal functional NN layer library.

Channels-last (B, ..., C) throughout — the reference's 1x1 Conv1d/Conv2d
stacks (pointnet2/pytorch_utils.py:11-36) are just per-point dense layers, so
on TPU they become einsums on the trailing axis that XLA tiles straight onto
the MXU.  Parameters are plain pytrees (nested dicts of jnp arrays), models
are pure functions — jit/grad/vmap/shard_map compose without a framework.
"""

from graspnet_tpu.nn.layers import (
    dense,
    dense_init,
    batch_norm,
    batch_norm_init,
    shared_mlp,
    shared_mlp_init,
    shared_mlp_update_stats,
)

__all__ = [
    "dense",
    "dense_init",
    "batch_norm",
    "batch_norm_init",
    "shared_mlp",
    "shared_mlp_init",
    "shared_mlp_update_stats",
]
