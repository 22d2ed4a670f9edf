"""Voxel-grid downsampling (replaces the reference's open3d dependency).

open3d's voxel_down_sample (used at reference utils/collision_detector.py:34)
averages all points falling in each voxel of an axis-aligned grid anchored at
the cloud's min bound.  This native implementation reproduces that contract
(centroid per occupied voxel); output ordering is by voxel hash, which differs
from open3d's but every consumer (collision counting) is order-invariant.
"""

from __future__ import annotations

import numpy as np


def voxel_down_sample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """(N, 3) -> (K, 3) centroid per occupied voxel."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return pts.astype(np.float32)
    min_bound = pts.min(axis=0) - voxel_size * 0.5
    coords = np.floor((pts - min_bound) / voxel_size).astype(np.int64)
    # unique voxel ids via lexicographic packing
    dims = coords.max(axis=0) + 1
    key = (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2] + coords[:, 2]
    uniq, inverse = np.unique(key, return_inverse=True)
    sums = np.zeros((len(uniq), 3), dtype=np.float64)
    np.add.at(sums, inverse, pts)
    counts = np.bincount(inverse, minlength=len(uniq)).astype(np.float64)
    return (sums / counts[:, None]).astype(np.float32)
