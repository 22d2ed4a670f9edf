"""Geometry op library.

TPU-native replacements for the reference's CUDA extensions
(reference pointnet2/_ext_src/src/*.cu and knn/src/**).  Each op is a pure,
fixed-shape JAX function that vmaps over the batch axis; the semantics —
including index-order-dependent padding and tie-breaking — are documented per
function and pinned by NumPy-oracle tests in tests/oracles.py.

Hot ops additionally have Pallas TPU kernels under graspnet_tpu.ops.pallas;
the public entry points dispatch to them on TPU backends.
"""

from graspnet_tpu.ops.sampling import furthest_point_sample, gather_points
from graspnet_tpu.ops.query import ball_query, cylinder_query, group_points
from graspnet_tpu.ops.knn import knn, three_nn, three_interpolate

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "ball_query",
    "cylinder_query",
    "group_points",
    "knn",
    "three_nn",
    "three_interpolate",
]
