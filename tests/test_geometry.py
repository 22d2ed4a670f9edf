"""Geometry helper parity vs direct transcriptions of the reference math."""

import numpy as np

from graspnet_tpu.models import geometry

import jax.numpy as jnp


def views_oracle(n):
    """Direct numpy transcription of loss_utils.generate_grasp_views:41-66."""
    phi = (np.sqrt(5) - 1) / 2
    out = []
    for i in range(n):
        zi = (2 * i + 1) / n - 1
        xi = np.sqrt(1 - zi**2) * np.cos(2 * i * np.pi * phi)
        yi = np.sqrt(1 - zi**2) * np.sin(2 * i * np.pi * phi)
        out.append([xi, yi, zi])
    return np.array(out, dtype=np.float32)


def matrix_oracle(towards, angle):
    """Transcription of loss_utils.batch_viewpoint_params_to_matrix:68-96."""
    n = towards.shape[0]
    axis_x = towards.astype(np.float32).copy()
    axis_y = np.stack([-axis_x[:, 1], axis_x[:, 0], np.zeros(n, np.float32)], axis=-1)
    mask = np.linalg.norm(axis_y, axis=-1) == 0
    axis_y[mask, 1] = 1
    axis_x = axis_x / np.linalg.norm(axis_x, axis=-1, keepdims=True)
    axis_y = axis_y / np.linalg.norm(axis_y, axis=-1, keepdims=True)
    axis_z = np.cross(axis_x, axis_y)
    sin, cos = np.sin(angle), np.cos(angle)
    ones, zeros = np.ones(n, np.float32), np.zeros(n, np.float32)
    R1 = np.stack([ones, zeros, zeros, zeros, cos, -sin, zeros, sin, cos], axis=-1).reshape(-1, 3, 3)
    R2 = np.stack([axis_x, axis_y, axis_z], axis=-1)
    return np.matmul(R2, R1)


def test_views_match():
    np.testing.assert_allclose(
        np.asarray(geometry.generate_grasp_views(300)), views_oracle(300), atol=1e-6
    )


def test_viewpoint_matrix_matches(rng):
    towards = rng.normal(size=(50, 3)).astype(np.float32)
    angle = rng.uniform(0, np.pi, size=50).astype(np.float32)
    got = np.asarray(
        geometry.batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angle))
    )
    np.testing.assert_allclose(got, matrix_oracle(towards, angle), atol=1e-5)


def test_viewpoint_matrix_degenerate_vertical():
    towards = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
    angle = np.zeros(2, np.float32)
    got = np.asarray(
        geometry.batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angle))
    )
    np.testing.assert_allclose(got, matrix_oracle(towards, angle), atol=1e-6)
    # must be valid rotations
    for R in got:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_rotation_matrices_orthonormal(rng):
    towards = rng.normal(size=(20, 3)).astype(np.float32)
    angle = rng.uniform(0, np.pi, size=20).astype(np.float32)
    got = np.asarray(
        geometry.batch_viewpoint_params_to_matrix(jnp.asarray(towards), jnp.asarray(angle))
    )
    for R in got:
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(R) > 0.99


def test_huber():
    err = jnp.asarray(np.linspace(-3, 3, 13, dtype=np.float32))
    got = np.asarray(geometry.huber_loss(err, delta=1.0))
    a = np.abs(np.linspace(-3, 3, 13))
    q = np.minimum(a, 1.0)
    want = 0.5 * q**2 + (a - q)
    np.testing.assert_allclose(got, want, atol=1e-6)
