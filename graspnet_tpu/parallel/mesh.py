"""Mesh construction and sharding helpers.

The reference has no distributed support at all (SURVEY.md §2.9: single
cuda:0, no NCCL/MPI).  Here data parallelism is first-class: scenes shard
across a 1-D 'data' mesh axis (one scene's cloud always stays on one chip),
params replicate, and XLA inserts the psum/all-reduce collectives for the
batch-mean loss, gradients, and batch-norm statistics automatically — giving
exact global-batch sync-BN for free.

A second 'candidate' axis is reserved for splitting the stage-2 candidate
sweep (seeds x views x angles x depths) within a scene; see
graspnet_tpu.parallel.candidate.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[Any]] = None,
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over the first n devices.

    1-D by default; pass `shape` for multi-axis meshes, e.g.
    make_mesh(8, ("data", "candidate"), shape=(2, 4)) — scenes over hosts,
    candidate blocks within.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    assert len(shape) == len(axis_names), (shape, axis_names)
    return Mesh(np.array(devs).reshape(tuple(shape)), axis_names)


def shard_batch(mesh: Mesh, tree: Any, axis: str = "data") -> Any:
    """Place a host batch pytree with the leading axis sharded over `axis`.

    Single-process: plain device_put onto the NamedSharding.  Multi-process
    (jax.distributed initialized): each host passes its PROCESS-LOCAL rows
    and the global array is assembled with make_array_from_process_local_data
    — device_put onto non-addressable devices would raise.  Scalars (e.g. the
    batch-global label u_max) replicate and must therefore be equal on every
    process.
    """
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P() if np.ndim(x) == 0 else P(axis, *([None] * (np.ndim(x) - 1)))
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
