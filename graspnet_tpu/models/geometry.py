"""Grasp geometry helpers.

JAX re-implementations of reference utils/loss_utils.py: the Fibonacci view
lattice (:41-66), approach-vector+angle -> rotation matrix (:68-96), point
transforms (:13-39), and the Huber loss (:98-115).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

GRASP_MAX_WIDTH = 0.1
GRASP_MAX_TOLERANCE = 0.05
THRESH_GOOD = 0.7
THRESH_BAD = 0.1


@functools.lru_cache(maxsize=None)
def generate_grasp_views_np(n: int = 300, phi: float = (np.sqrt(5) - 1) / 2, r: float = 1.0) -> np.ndarray:
    """Fibonacci lattice on the unit sphere (reference loss_utils.py:41-66).

    Computed in float64 then cast, exactly as the reference's numpy path.
    """
    i = np.arange(n, dtype=np.float64)
    z = (2 * i + 1) / n - 1
    s = np.sqrt(1 - z**2)
    x = s * np.cos(2 * i * np.pi * phi)
    y = s * np.sin(2 * i * np.pi * phi)
    return (r * np.stack([x, y, z], axis=1)).astype(np.float32)


def generate_grasp_views(n: int = 300) -> jax.Array:
    return jnp.asarray(generate_grasp_views_np(n))


def batch_viewpoint_params_to_matrix(towards: jax.Array, angle: jax.Array) -> jax.Array:
    """Approach vectors + in-plane angles -> rotation matrices.

    Matches reference loss_utils.py:68-96: x-axis = approach direction,
    y-axis = horizontal perpendicular (with the degenerate-vertical guard at
    :84-86), z = x × y, then an in-plane roll about x.

    Args:
      towards: (..., 3) approach vectors.
      angle: (...,) in-plane rotation angles.

    Returns:
      (..., 3, 3) rotation matrices.
    """
    x = towards
    zeros = jnp.zeros_like(x[..., 0])
    ones = jnp.ones_like(x[..., 0])
    y = jnp.stack([-x[..., 1], x[..., 0], zeros], axis=-1)
    # degenerate: approach along ±z -> y-norm is 0; reference sets y=(0,1,0)
    y_norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
    degenerate = (y_norm == 0)
    y = jnp.where(degenerate, jnp.array([0.0, 1.0, 0.0], x.dtype), y)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = y / jnp.linalg.norm(y, axis=-1, keepdims=True)
    z = jnp.cross(x, y)
    sin = jnp.sin(angle)
    cos = jnp.cos(angle)
    r1 = jnp.stack(
        [ones, zeros, zeros, zeros, cos, -sin, zeros, sin, cos], axis=-1
    ).reshape(*angle.shape, 3, 3)
    r2 = jnp.stack([x, y, z], axis=-1)  # columns are the axes
    return jnp.matmul(r2, r1)


def batch_viewpoint_params_to_matrix_np(
    towards: np.ndarray, angle: np.ndarray
) -> np.ndarray:
    """Numpy twin of batch_viewpoint_params_to_matrix for host pipelines —
    never dispatches to a device (a tiny per-object device op through a
    remote backend costs seconds per scene in the data loader)."""
    x = np.asarray(towards, np.float32)
    angle = np.asarray(angle, np.float32)
    zeros = np.zeros_like(x[..., 0])
    ones = np.ones_like(x[..., 0])
    y = np.stack([-x[..., 1], x[..., 0], zeros], axis=-1)
    y_norm = np.linalg.norm(y, axis=-1, keepdims=True)
    y = np.where(y_norm == 0, np.array([0.0, 1.0, 0.0], np.float32), y)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    y = y / np.linalg.norm(y, axis=-1, keepdims=True)
    z = np.cross(x, y)
    sin, cos = np.sin(angle), np.cos(angle)
    r1 = np.stack(
        [ones, zeros, zeros, zeros, cos, -sin, zeros, sin, cos], axis=-1
    ).reshape(*angle.shape, 3, 3)
    r2 = np.stack([x, y, z], axis=-1)
    return (r2 @ r1).astype(np.float32)


@functools.lru_cache(maxsize=8)
def canonical_view_rotations_np(num_view: int) -> np.ndarray:
    """(V, 3, 3) zero-angle rotations of the -view approach directions —
    constant per view count, cached for the host label pipeline."""
    views = generate_grasp_views_np(num_view)
    return batch_viewpoint_params_to_matrix_np(
        -views, np.zeros(num_view, np.float32)
    )


def transform_point_cloud(cloud: jax.Array, transform: jax.Array) -> jax.Array:
    """Apply a (3,3) rotation or (3,4)/(4,4) rigid transform to (N,3) points."""
    if transform.shape[-2:] == (3, 3):
        return cloud @ transform.T
    rot = transform[:3, :3]
    trans = transform[:3, 3]
    return cloud @ rot.T + trans


def huber_loss(error: jax.Array, delta: float = 1.0) -> jax.Array:
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear
