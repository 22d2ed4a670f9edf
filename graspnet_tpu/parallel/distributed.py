"""Multi-host orchestration.

The reference is strictly single-process / single-GPU (SURVEY.md §2.9: no
NCCL/MPI/torch.distributed anywhere).  Here multi-host runs are first-class:
each host calls `initialize()` once before touching devices, then builds the
global mesh with `global_mesh()`; XLA routes the gradient / batch-norm
all-reduces over ICI within a slice and DCN across slices.

Launch pattern (one process per host):

    GRASPNET_COORDINATOR=host0:8476 GRASPNET_NUM_PROCESSES=4 \
    GRASPNET_PROCESS_ID=$i python -m graspnet_tpu.apps.train ...

On TPU pods with the standard runtime metadata the env vars are optional —
jax.distributed.initialize() autodetects.  Single-host runs skip
initialization entirely (no env set, one process).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

_initialized = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or GRASPNET_* / auto-detection.

    Returns True when a multi-process runtime was initialized, False for
    plain single-host runs.  Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("GRASPNET_COORDINATOR")
    if num_processes is None and "GRASPNET_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["GRASPNET_NUM_PROCESSES"])
    if process_id is None and "GRASPNET_PROCESS_ID" in os.environ:
        process_id = int(os.environ["GRASPNET_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        return False  # single host

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def global_mesh(axis_names: Sequence[str] = ("data",), shape=None):
    """Mesh over ALL devices of the (possibly multi-host) runtime.

    With the 1-D default, scenes shard across every chip of every host;
    jax.make_array_from_process_local_data / shard_batch feed each host's
    local slice.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(tuple(shape)), tuple(axis_names))


def process_local_batch_slice(global_batch_size: int) -> slice:
    """The [start, stop) rows of the global batch this host should load."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = global_batch_size // n
    assert per * n == global_batch_size, (
        f"process count {n} must divide the global batch {global_batch_size}"
    )
    return slice(i * per, (i + 1) * per)
