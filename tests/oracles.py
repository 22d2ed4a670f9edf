"""NumPy oracles re-implementing the reference CUDA kernel semantics.

These are deliberately written as direct, loop-level transcriptions of the
behavior documented in SURVEY.md §2.1 (scan order, first-hit padding,
near-origin skip, tie-breaking) so the vectorized JAX ops can be tested
against them bit-for-bit.  Sources:
  * FPS: pointnet2/_ext_src/src/sampling_gpu.cu:74-178
  * ball query: ball_query_gpu.cu:14-49
  * cylinder query: cylinder_query_gpu.cu:9-57
  * three_nn: interpolate_gpu.cu:14-56
  * knn: knn/src/cuda/knn.cu (stable ascending selection; 0-based here)
"""

import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """(N, 3) -> (npoint,) int32. Sequential furthest point sampling."""
    n = xyz.shape[0]
    mag = np.sum(xyz.astype(np.float32) ** 2, axis=1)
    valid = mag > 1e-3
    temp = np.full(n, 1e10, dtype=np.float32)
    idxs = np.zeros(npoint, dtype=np.int32)
    old = 0
    for j in range(1, npoint):
        diff = xyz - xyz[old]
        d = np.sum(diff.astype(np.float32) ** 2, axis=1)
        temp[valid] = np.minimum(d[valid], temp[valid])
        score = np.where(valid, temp, -1.0)
        old = int(np.argmax(score))
        idxs[j] = old
    return idxs


def ball_query_oracle(
    xyz: np.ndarray, new_xyz: np.ndarray, radius: float, nsample: int
) -> np.ndarray:
    """(N,3),(M,3) -> (M,nsample) int32, first-hit padding, zeros if empty."""
    m = new_xyz.shape[0]
    n = xyz.shape[0]
    idx = np.zeros((m, nsample), dtype=np.int32)
    r2 = radius * radius
    for j in range(m):
        cnt = 0
        for k in range(n):
            d2 = np.sum((new_xyz[j] - xyz[k]) ** 2)
            if d2 < r2:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
                if cnt == nsample:
                    break
    return idx


def cylinder_query_oracle(
    xyz: np.ndarray,
    new_xyz: np.ndarray,
    rot: np.ndarray,
    radius: float,
    hmin: float,
    hmax: float,
    nsample: int,
) -> np.ndarray:
    """(N,3),(M,3),(M,3,3) -> (M,nsample) int32."""
    m = new_xyz.shape[0]
    n = xyz.shape[0]
    idx = np.zeros((m, nsample), dtype=np.int32)
    r2 = radius * radius
    for j in range(m):
        R = rot[j]
        cnt = 0
        for k in range(n):
            off = xyz[k] - new_xyz[j]
            x_r = R[0, 0] * off[0] + R[1, 0] * off[1] + R[2, 0] * off[2]
            y_r = R[0, 1] * off[0] + R[1, 1] * off[1] + R[2, 1] * off[2]
            z_r = R[0, 2] * off[0] + R[1, 2] * off[1] + R[2, 2] * off[2]
            if y_r * y_r + z_r * z_r < r2 and hmin < x_r < hmax:
                if cnt == 0:
                    idx[j, :] = k
                idx[j, cnt] = k
                cnt += 1
                if cnt == nsample:
                    break
    return idx


def three_nn_oracle(unknown: np.ndarray, known: np.ndarray):
    """(n,3),(m,3) -> dist (n,3), idx (n,3). Running min-3, strict <."""
    n = unknown.shape[0]
    dist = np.zeros((n, 3), dtype=np.float32)
    idx = np.zeros((n, 3), dtype=np.int32)
    for i in range(n):
        d2 = np.sum((known - unknown[i]) ** 2, axis=1)
        best = [(np.inf, 0), (np.inf, 0), (np.inf, 0)]
        for k, d in enumerate(d2):
            if d < best[0][0]:
                best = [(d, k), best[0], best[1]]
            elif d < best[1][0]:
                best = [best[0], (d, k), best[1]]
            elif d < best[2][0]:
                best = [best[0], best[1], (d, k)]
        dist[i] = np.sqrt([b[0] for b in best])
        idx[i] = [b[1] for b in best]
    return dist, idx


def knn_oracle(ref: np.ndarray, query: np.ndarray, k: int) -> np.ndarray:
    """(Nr,3),(Nq,3) -> (Nq,k) int32, 0-based, stable ascending by distance."""
    d2 = np.sum((query[:, None, :] - ref[None, :, :]) ** 2, axis=-1)
    return np.argsort(d2, axis=1, kind="stable")[:, :k].astype(np.int32)
