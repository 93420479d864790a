"""SO(3) math: exp/log roundtrips, rotation equivalences, Jacobian identities.

These are the finite-difference tests the reference never had (SURVEY.md §4):
the filter's tangent transports are only correct if A_matrix(v)^T equals the
SO(3) right Jacobian, i.e. inverts d log(exp(v) exp(d))/dd at d=0.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fast_lio_tpu.math import so3

RNG = np.random.default_rng(0)


def rand_vec(scale=1.0, n=None):
    shape = (3,) if n is None else (n, 3)
    return jnp.asarray(RNG.normal(size=shape) * scale)


def test_exp_log_roundtrip():
    for scale in [1e-9, 1e-5, 0.1, 1.0, 3.0]:
        v = rand_vec(scale, n=32)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30) * scale
        q = so3.so3_exp(v)
        np.testing.assert_allclose(jnp.linalg.norm(q, axis=-1), 1.0, atol=1e-12)
        v2 = so3.so3_log(q)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-9)


def test_log_sign_periodicity():
    # q and -q must give the same rotation vector (MTK plus/minus periodicity).
    v = rand_vec(0.7, n=8)
    q = so3.so3_exp(v)
    np.testing.assert_allclose(
        np.asarray(so3.so3_log(q)), np.asarray(so3.so3_log(-q)), atol=1e-12
    )


def test_exp_matrix_consistency():
    v = rand_vec(1.2, n=16)
    R_quat = so3.quat_to_matrix(so3.so3_exp(v))
    R_rod = so3.so3_exp_matrix(v)
    np.testing.assert_allclose(np.asarray(R_quat), np.asarray(R_rod), atol=1e-10)


def test_quat_rotate_matches_matrix():
    v = rand_vec(1.0, n=16)
    q = so3.so3_exp(v)
    x = rand_vec(5.0, n=16)
    np.testing.assert_allclose(
        np.asarray(so3.quat_rotate(q, x)),
        np.asarray(jnp.einsum("nij,nj->ni", so3.quat_to_matrix(q), x)),
        atol=1e-10,
    )


def test_quat_multiply_matches_matrix_product():
    a, b = rand_vec(1.0, n=8), rand_vec(1.0, n=8)
    qa, qb = so3.so3_exp(a), so3.so3_exp(b)
    lhs = so3.quat_to_matrix(so3.quat_multiply(qa, qb))
    rhs = so3.quat_to_matrix(qa) @ so3.quat_to_matrix(qb)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-10)


def test_matrix_to_quat_roundtrip():
    # include near-pi rotations that break the naive trace formula
    for scale in [1e-6, 0.5, np.pi - 1e-4, np.pi - 1e-7]:
        v = rand_vec(1.0, n=16)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True) * scale
        q = so3.so3_exp(v)
        R = so3.quat_to_matrix(q)
        q2 = so3.matrix_to_quat(R)
        # q and -q are the same rotation
        dot = jnp.abs(jnp.sum(q * q2, axis=-1))
        np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-9)


def test_hat_antisymmetry_and_cross():
    v, w = rand_vec(1.0, n=8), rand_vec(1.0, n=8)
    H = so3.hat(v)
    np.testing.assert_allclose(np.asarray(H + jnp.swapaxes(H, -1, -2)), 0.0, atol=0)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", H, w)), np.asarray(jnp.cross(v, w)), atol=1e-12
    )


@pytest.mark.parametrize("scale", [1e-7, 1e-3, 0.5, 2.5])
def test_A_matrix_transpose_is_right_jacobian(scale):
    """A(v)^T must invert d/dd log(exp(v) exp(d)) at d=0 (esekfom.hpp:1668)."""
    eps = 1e-6
    for _ in range(5):
        v = np.asarray(rand_vec(1.0))
        v = v / np.linalg.norm(v) * scale
        J = np.zeros((3, 3))
        qv = so3.so3_exp(jnp.asarray(v))
        for k in range(3):
            d = np.zeros(3)
            d[k] = eps
            plus = so3.so3_log(so3.quat_multiply(qv, so3.so3_exp(jnp.asarray(d))))
            minus = so3.so3_log(so3.quat_multiply(qv, so3.so3_exp(jnp.asarray(-d))))
            J[:, k] = np.asarray(plus - minus) / (2 * eps)
        At = np.asarray(so3.A_matrix(jnp.asarray(v))).T
        np.testing.assert_allclose(At @ J, np.eye(3), atol=5e-5)


def test_euler_roundtrip_against_reference_formula():
    v = rand_vec(0.8, n=4)
    q = so3.so3_exp(v)
    eul = np.asarray(so3.quat_to_euler_deg(q)) / 57.3
    # rebuild rotation from rpy (ZYX convention) and compare
    for i in range(4):
        r, p, y = eul[i]
        Rz = np.array([[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]])
        Ry = np.array([[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]])
        Rx = np.array([[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]])
        np.testing.assert_allclose(
            Rz @ Ry @ Rx, np.asarray(so3.quat_to_matrix(q[i])), atol=1e-6
        )
