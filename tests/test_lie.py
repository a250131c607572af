"""Lie-group tests: closure, round-trips, finite-difference Jacobians."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hortimapping_tpu.ops.lie import (
    axis_angle_to_rotation_matrix,
    exp_se3,
    exp_sim3,
    points_to_pose_jacobian_se3,
    points_to_pose_jacobian_sim3,
    rotation_matrix_to_angle,
    skew,
)


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape) * scale, jnp.float32)


def test_exp_se3_zero():
    T = exp_se3(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


def test_exp_se3_pure_translation():
    x = jnp.array([0.1, -0.2, 0.3, 0.0, 0.0, 0.0])
    T = np.asarray(exp_se3(x))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-7)
    np.testing.assert_allclose(T[:3, 3], [0.1, -0.2, 0.3], atol=1e-7)


def test_exp_se3_rotation_properties():
    x = _rand((6,), 0, 0.5)
    T = np.asarray(exp_se3(x))
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # rotation angle equals |w|
    w = np.asarray(x[3:6])
    np.testing.assert_allclose(
        float(rotation_matrix_to_angle(jnp.asarray(R))), np.linalg.norm(w), atol=1e-5
    )


def test_exp_se3_matches_matrix_exponential():
    from scipy.linalg import expm

    x = _rand((6,), 1, 0.7)
    v, w = np.asarray(x[:3], dtype=np.float64), np.asarray(x[3:6], dtype=np.float64)
    xi = np.zeros((4, 4))
    xi[:3, :3] = np.asarray(skew(jnp.asarray(w)))
    xi[:3, 3] = v
    np.testing.assert_allclose(np.asarray(exp_se3(x)), expm(xi), atol=1e-5)


def test_exp_sim3_matches_matrix_exponential():
    from scipy.linalg import expm

    for seed in range(5):
        x = _rand((7,), seed, 0.5)
        v = np.asarray(x[:3], dtype=np.float64)
        w = np.asarray(x[3:6], dtype=np.float64)
        s = float(x[6])
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(skew(jnp.asarray(w))) + s * np.eye(3)
        xi[:3, 3] = v
        np.testing.assert_allclose(np.asarray(exp_sim3(x)), expm(xi), atol=2e-5)


def test_exp_sim3_small_branches():
    from scipy.linalg import expm

    cases = [
        np.array([0.1, 0.2, -0.1, 0, 0, 0, 0.3]),      # theta = 0
        np.array([0.1, 0.2, -0.1, 0.2, -0.1, 0.3, 0]),  # s = 0
        np.array([0.1, 0.2, -0.1, 0, 0, 0, 0]),          # both 0
        np.array([0.1, 0.2, -0.1, 1e-6, 0, 0, 1e-6]),    # both tiny
    ]
    for x in cases:
        xi = np.zeros((4, 4))
        xi[:3, :3] = np.asarray(skew(jnp.asarray(x[3:6]))) + x[6] * np.eye(3)
        xi[:3, 3] = x[:3]
        np.testing.assert_allclose(
            np.asarray(exp_sim3(jnp.asarray(x, jnp.float32))), expm(xi), atol=2e-6
        )


def test_exp_sim3_scale():
    x = jnp.array([0.0, 0, 0, 0, 0, 0, 0.2])
    T = np.asarray(exp_sim3(x))
    np.testing.assert_allclose(np.linalg.det(T[:3, :3]) ** (1 / 3), np.exp(0.2), rtol=1e-5)


@pytest.mark.parametrize("group", ["se3", "sim3"])
def test_point_pose_jacobian_finite_difference(group):
    """J = d(exp(d) x)/dd at d = 0, left perturbation."""
    pts = _rand((11, 3), 3, 0.4)
    if group == "se3":
        J = np.asarray(points_to_pose_jacobian_se3(pts))
        dim, expf = 6, exp_se3
    else:
        J = np.asarray(points_to_pose_jacobian_sim3(pts))
        dim, expf = 7, exp_sim3
    eps = 1e-3
    for i in range(dim):
        d = jnp.zeros(dim).at[i].set(eps)
        Tp, Tm = np.asarray(expf(d)), np.asarray(expf(-d))
        p = np.asarray(pts)
        fd = ((Tp[:3, :3] @ p.T + Tp[:3, 3:4]) - (Tm[:3, :3] @ p.T + Tm[:3, 3:4])).T / (2 * eps)
        np.testing.assert_allclose(J[:, :, i], fd, atol=5e-3)


def test_axis_angle_roundtrip():
    aa = _rand((3,), 5, 0.8)
    R = axis_angle_to_rotation_matrix(aa)
    np.testing.assert_allclose(
        float(rotation_matrix_to_angle(R)), float(jnp.linalg.norm(aa)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(axis_angle_to_rotation_matrix(jnp.zeros(3))), np.eye(3), atol=0
    )


def test_batched_and_vmapped():
    xs = _rand((4, 6), 6, 0.3)
    batched = np.asarray(exp_se3(xs))
    vmapped = np.asarray(jax.vmap(exp_se3)(xs))
    single = np.stack([np.asarray(exp_se3(xs[i])) for i in range(4)])
    np.testing.assert_allclose(batched, single, atol=1e-6)
    np.testing.assert_allclose(vmapped, single, atol=1e-6)
