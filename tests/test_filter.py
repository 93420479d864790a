"""Filter engine: process-model Jacobians vs finite differences, predict-F
consistency, and the iterated update vs the textbook Kalman solution on a
linear problem — the golden tests SURVEY.md §4 calls for.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from fast_lio_tpu import state as st
from fast_lio_tpu.filter import ekf, process
from fast_lio_tpu.filter.ekf import MeasOut

RNG = np.random.default_rng(7)


def rand_state(scale=0.5):
    s = st.identity_state(jnp.float64)
    return st.boxplus(s, jnp.asarray(RNG.normal(size=23) * scale))


def rand_spd(n, scale=1.0):
    A = RNG.normal(size=(n, n))
    return jnp.asarray(A @ A.T * scale / n + np.eye(n) * 1e-3)


def test_df_dx_finite_difference():
    s = rand_state()
    acc = jnp.asarray(RNG.normal(size=3) * 2 + np.array([0, 0, 9.8]))
    gyro = jnp.asarray(RNG.normal(size=3))
    J = np.asarray(process.df_dx(s, acc, gyro))
    eps = 1e-7
    J_fd = np.zeros((st.DIM, st.DOF))
    for k in range(st.DOF):
        d = np.zeros(st.DOF)
        d[k] = eps
        fp = process.f_dynamics(st.boxplus(s, jnp.asarray(d)), acc, gyro)
        fm = process.f_dynamics(st.boxplus(s, jnp.asarray(-d)), acc, gyro)
        J_fd[:, k] = np.asarray(fp - fm) / (2 * eps)
    np.testing.assert_allclose(J, J_fd, atol=1e-5)


def test_df_dw_structure():
    s = rand_state()
    J = np.asarray(process.df_dw(s))
    R = np.asarray(
        __import__("fast_lio_tpu.math.so3", fromlist=["so3"]).quat_to_matrix(s.rot)
    )
    np.testing.assert_allclose(J[3:6, 0:3], -np.eye(3), atol=0)
    np.testing.assert_allclose(J[12:15, 3:6], -R, atol=1e-12)
    np.testing.assert_allclose(J[15:18, 6:9], np.eye(3), atol=0)
    np.testing.assert_allclose(J[18:21, 9:12], np.eye(3), atol=0)


def test_predict_jacobian_vs_finite_difference():
    """F from predict must match the FD Jacobian of the discrete-time map
    delta -> (propagate(x boxplus delta) boxminus propagate(x)) to O(dt^2)."""
    s = rand_state(0.3)
    acc = jnp.asarray(RNG.normal(size=3) + np.array([0, 0, 9.8]))
    gyro = jnp.asarray(RNG.normal(size=3) * 0.5)
    dt = 1e-3
    Q = process.process_noise_cov(0.1, 0.1, 1e-4, 1e-4, jnp.float64)
    P0 = jnp.eye(23, dtype=jnp.float64)

    x1, P1 = ekf.predict(s, P0, dt, Q, acc, gyro)

    def prop_mean(x):
        f = process.f_dynamics(x, acc, gyro)
        return st.oplus(x, f, dt)

    eps = 1e-6
    F_fd = np.zeros((23, 23))
    for k in range(23):
        d = np.zeros(23)
        d[k] = eps
        xp = prop_mean(st.boxplus(s, jnp.asarray(d)))
        xm = prop_mean(st.boxplus(s, jnp.asarray(-d)))
        F_fd[:, k] = np.asarray(st.boxminus(xp, xm)) / (2 * eps)

    # recover F from P1 = F P0 F^T + dt^2 Fw Q Fw^T with P0 = I:
    # instead compare directly using predict's internals via P with Q = 0
    _, P_noQ = ekf.predict(s, P0, dt, jnp.zeros((12, 12), dtype=jnp.float64), acc, gyro)
    # P_noQ = F F^T; F_fd F_fd^T should match to O(dt^2)
    np.testing.assert_allclose(
        np.asarray(P_noQ), F_fd @ F_fd.T, atol=5e-5
    )


def test_predict_constant_velocity():
    """Pure kinematics: gravity cancel, no rotation -> pos += vel*dt."""
    s = st.identity_state(jnp.float64)
    s = s._replace(vel=jnp.asarray([1.0, 2.0, 3.0]), grav=jnp.asarray([0.0, 0.0, -st.S2_LENGTH]))
    # acc (body) exactly cancels gravity
    acc = jnp.asarray([0.0, 0.0, st.S2_LENGTH])
    gyro = jnp.zeros(3, dtype=jnp.float64)
    Q = jnp.zeros((12, 12), dtype=jnp.float64)
    P = jnp.eye(23, dtype=jnp.float64)
    dt = 0.01
    x, P = ekf.predict(s, P, dt, Q, acc, gyro)
    np.testing.assert_allclose(np.asarray(x.pos), [0.01, 0.02, 0.03], atol=1e-12)
    np.testing.assert_allclose(np.asarray(x.vel), [1.0, 2.0, 3.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(x.rot), [1, 0, 0, 0], atol=1e-12)


def _linear_meas_fn(H, x_true, n_rows):
    """Noise-free linear measurement on the first-12 error coords."""

    def h_fn(x_iter, converge, carry):
        innov = st.boxminus(x_true, x_iter)[:12]
        h = H @ innov
        return MeasOut(
            h_x=H,
            h=h,
            mask=jnp.ones(n_rows, dtype=bool),
            valid=jnp.asarray(True),
            carry=carry,
        )

    return h_fn


def test_update_single_iteration_matches_textbook():
    """First iterate (dx_new = 0) must equal the textbook information-form
    Kalman correction dx = (P^-1 + H^T H / R)^-1 H^T z / R."""
    x0 = st.identity_state(jnp.float64)
    P0 = rand_spd(23, 0.1)
    N = 64
    H = jnp.asarray(RNG.normal(size=(N, 12)))
    dx_true = np.zeros(23)
    dx_true[:12] = RNG.normal(size=12) * 0.01
    x_true = st.boxplus(x0, jnp.asarray(dx_true))
    R = 0.001

    # max_iter=0 runs exactly one lap (the C++ loop starts at i=-1 and the
    # i == max_iter-1 exit fires immediately), isolating a single correction.
    res = ekf.update_iterated(
        x0, P0, _linear_meas_fn(H, x_true, N), None, R, max_iter=0, epsi=1e-12
    )
    # closed form single-step
    z = np.asarray(H) @ np.asarray(st.boxminus(x_true, x0))[:12]
    Pinv = np.linalg.inv(np.asarray(P0))
    HtH = np.zeros((23, 23))
    HtH[:12, :12] = np.asarray(H.T @ H)
    info = Pinv + HtH / R
    dx_expected = np.linalg.solve(info, np.concatenate([np.asarray(H).T @ z, np.zeros(11)]) / R)
    got = np.asarray(st.boxminus(res.x, x0))
    np.testing.assert_allclose(got, dx_expected, atol=1e-8)


def test_update_iterated_converges_to_truth():
    x0 = rand_state(0.05)
    P0 = jnp.asarray(np.eye(23) * 0.1)
    N = 256
    H = jnp.asarray(RNG.normal(size=(N, 12)))
    dx_true = np.zeros(23)
    dx_true[:12] = RNG.normal(size=12) * 0.02
    x_true = st.boxplus(x0, jnp.asarray(dx_true))

    res = ekf.update_iterated(
        x0, P0, _linear_meas_fn(H, x_true, N), None, 1e-6, max_iter=10, epsi=1e-9
    )
    err = np.asarray(st.boxminus(res.x, x_true))
    np.testing.assert_allclose(err[:12], 0.0, atol=1e-5)
    assert bool(res.valid)


def test_update_posterior_covariance_linear():
    """Converged posterior P must match (I - K H) P for the linear problem."""
    x0 = st.identity_state(jnp.float64)
    P0 = rand_spd(23, 0.05)
    N = 48
    H = jnp.asarray(RNG.normal(size=(N, 12)))
    x_true = x0  # zero innovation -> dx stays ~0, transports ~identity
    R = 0.01
    res = ekf.update_iterated(
        x0, P0, _linear_meas_fn(H, x_true, N), None, R, max_iter=3, epsi=1e-3
    )
    Hp = np.zeros((N, 23))
    Hp[:, :12] = np.asarray(H)
    P0n = np.asarray(P0)
    S = Hp @ P0n @ Hp.T + R * np.eye(N)
    K = P0n @ Hp.T @ np.linalg.inv(S)
    P_expected = (np.eye(23) - K @ Hp) @ P0n
    np.testing.assert_allclose(np.asarray(res.P), P_expected, atol=1e-9)


def test_update_invalid_measurements_noop():
    x0 = rand_state(0.1)
    P0 = rand_spd(23, 0.1)

    def h_fn(x_iter, converge, carry):
        return MeasOut(
            h_x=jnp.zeros((8, 12)),
            h=jnp.zeros(8),
            mask=jnp.zeros(8, dtype=bool),
            valid=jnp.asarray(False),
            carry=carry,
        )

    res = ekf.update_iterated(x0, P0, h_fn, None, 0.001, max_iter=4)
    np.testing.assert_allclose(np.asarray(st.boxminus(res.x, x0)), 0.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(res.P), np.asarray(P0), atol=0)
    assert not bool(res.valid)


def test_update_mask_rows_ignored():
    """Masked-out rows must not influence the result (padding correctness)."""
    x0 = st.identity_state(jnp.float64)
    P0 = rand_spd(23, 0.1)
    N = 32
    H = np.asarray(RNG.normal(size=(N, 12)))
    dx_true = np.zeros(23)
    dx_true[:12] = RNG.normal(size=12) * 0.01
    x_true = st.boxplus(x0, jnp.asarray(dx_true))

    def make_fn(H_arr, mask):
        def h_fn(x_iter, converge, carry):
            innov = st.boxminus(x_true, x_iter)[:12]
            return MeasOut(
                h_x=jnp.asarray(H_arr),
                h=jnp.asarray(H_arr) @ innov,
                mask=jnp.asarray(mask),
                valid=jnp.asarray(True),
                carry=carry,
            )

        return h_fn

    # garbage rows in the padded tail, masked off
    H_padded = np.concatenate([H, RNG.normal(size=(16, 12)) * 100])
    mask = np.concatenate([np.ones(N, bool), np.zeros(16, bool)])
    res_a = ekf.update_iterated(x0, P0, make_fn(H_padded, mask), None, 0.001, 4)
    res_b = ekf.update_iterated(
        x0, P0, make_fn(H, np.ones(N, bool)), None, 0.001, 4
    )
    np.testing.assert_allclose(
        np.asarray(st.boxminus(res_a.x, res_b.x)), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(res_a.P), np.asarray(res_b.P), atol=1e-12)
