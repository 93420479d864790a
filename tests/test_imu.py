"""IMU propagation + deskew on synthetic trajectories with closed-form truth."""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu import imu, state as st
from fast_lio_tpu.filter import process
from fast_lio_tpu.math import so3

DT = jnp.float64
GVEC = np.array([0.0, 0.0, -st.S2_LENGTH])


def make_state():
    x = st.identity_state(DT)
    return x._replace(grav=jnp.asarray(GVEC, DT))


def zero_Q():
    return jnp.zeros((12, 12), dtype=DT)


def run_prop(x, imu_t, acc, gyr, mask, beg, end, pts=None, ptt=None, carry=None):
    if pts is None:
        pts = jnp.zeros((4, 3), dtype=DT)
        ptt = jnp.zeros(4, dtype=DT)
    if carry is None:
        carry = imu.ImuCarry(jnp.zeros(3, DT), jnp.zeros(3, DT))
    P = jnp.eye(23, dtype=DT)
    return imu.propagate_and_deskew(
        x, P, zero_Q(),
        jnp.asarray(imu_t) - beg, jnp.asarray(acc, DT), jnp.asarray(gyr, DT),
        jnp.asarray(mask),
        jnp.asarray(1.0, DT),
        jnp.asarray(0.0, DT), jnp.asarray(end - beg, DT),
        carry, jnp.asarray(pts, DT), jnp.asarray(ptt, DT),
    )


def test_static_hover():
    """Perfect stationary IMU: state must not move."""
    x = make_state()
    M = 16
    t = np.linspace(0.0, 0.1, 11)
    imu_t = np.concatenate([t, np.full(M - 11, t[-1])])
    mask = np.arange(M) < 11
    acc = np.tile([0, 0, st.S2_LENGTH], (M, 1))
    gyr = np.zeros((M, 3))
    x_end, P_end, _, carry = run_prop(x, imu_t, acc, gyr, mask, 0.0, 0.1)
    np.testing.assert_allclose(np.asarray(x_end.pos), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(x_end.vel), 0.0, atol=1e-12)


def test_constant_acceleration():
    """Constant world acceleration a: vel = a t, pos = a t^2 / 2."""
    x = make_state()
    a_w = np.array([1.0, -0.5, 0.3])
    M = 24
    n = 21
    t = np.linspace(0.0, 0.1, n)
    imu_t = np.concatenate([t, np.full(M - n, t[-1])])
    mask = np.arange(M) < n
    acc = np.tile(a_w + [0, 0, st.S2_LENGTH], (M, 1))
    gyr = np.zeros((M, 3))
    x_end, _, _, _ = run_prop(x, imu_t, acc, gyr, mask, 0.0, 0.1)
    np.testing.assert_allclose(np.asarray(x_end.vel), a_w * 0.1, atol=1e-9)
    # forward-Euler (f at pre-state, like the reference's oplus):
    # pos = sum_j vel_j dt = a dt^2 * (0+1+...+19)
    n_int = n - 1
    dt = 0.1 / n_int
    pos_expect = a_w * dt * dt * (n_int * (n_int - 1) / 2)
    np.testing.assert_allclose(np.asarray(x_end.pos), pos_expect, atol=1e-9)


def test_constant_rotation():
    """Constant gyro: orientation = exp(omega * T)."""
    x = make_state()
    omega = np.array([0.3, -0.2, 1.0])
    M = 40
    n = 33
    t = np.linspace(0.0, 0.1, n)
    imu_t = np.concatenate([t, np.full(M - n, t[-1])])
    mask = np.arange(M) < n
    # acc in body frame must track gravity to keep vel ~0: acc_b = R(t)^T * G
    accs = []
    for ti in t:
        R = np.asarray(so3.so3_exp_matrix(jnp.asarray(omega * ti)))
        accs.append(R.T @ (-GVEC))
    accs = np.stack(accs + [accs[-1]] * (M - n))
    gyr = np.tile(omega, (M, 1))
    x_end, _, _, _ = run_prop(x, imu_t, accs, gyr, mask, 0.0, 0.1)
    R_expect = np.asarray(so3.so3_exp_matrix(jnp.asarray(omega * 0.1)))
    R_got = np.asarray(so3.quat_to_matrix(x_end.rot))
    # midpoint integration over 32 intervals: O(dt^2) error
    np.testing.assert_allclose(R_got, R_expect, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x_end.vel), 0.0, atol=2e-3)


def test_deskew_constant_velocity():
    """Observations of one world point from a moving platform must collapse
    to a single point after deskew (in the scan-end frame)."""
    v = np.array([2.0, 0.0, 0.0])
    x = make_state()._replace(vel=jnp.asarray(v, DT))
    M = 16
    n = 11
    t = np.linspace(0.0, 0.1, n)
    imu_t = np.concatenate([t, np.full(M - n, t[-1])])
    mask = np.arange(M) < n
    acc = np.tile([0, 0, st.S2_LENGTH], (M, 1))
    gyr = np.zeros((M, 3))

    p_world = np.array([5.0, 1.0, 0.5])
    pt_times = np.array([0.0, 0.025, 0.05, 0.075, 0.1])
    pts_body = np.stack([p_world - v * ti for ti in pt_times])

    x_end, _, pts_out, _ = run_prop(
        x, imu_t, acc, gyr, mask, 0.0, 0.1, pts=pts_body, ptt=pt_times
    )
    expected = p_world - v * 0.1
    np.testing.assert_allclose(
        np.asarray(pts_out), np.tile(expected, (5, 1)), atol=1e-9
    )


def test_deskew_rotation():
    """Same, rotating platform at fixed position."""
    omega = np.array([0.0, 0.0, 2.0])
    x = make_state()
    M = 48
    n = 41
    t = np.linspace(0.0, 0.1, n)
    imu_t = np.concatenate([t, np.full(M - n, t[-1])])
    mask = np.arange(M) < n
    accs = []
    for ti in t:
        R = np.asarray(so3.so3_exp_matrix(jnp.asarray(omega * ti)))
        accs.append(R.T @ (-GVEC))
    accs = np.stack(accs + [accs[-1]] * (M - n))
    gyr = np.tile(omega, (M, 1))

    p_world = np.array([3.0, -1.0, 0.2])
    pt_times = np.array([0.01, 0.04, 0.07, 0.1])
    pts_body = []
    for ti in pt_times:
        R = np.asarray(so3.so3_exp_matrix(jnp.asarray(omega * ti)))
        pts_body.append(R.T @ p_world)
    pts_body = np.stack(pts_body)

    x_end, _, pts_out, _ = run_prop(
        x, imu_t, accs, gyr, mask, 0.0, 0.1, pts=pts_body, ptt=pt_times
    )
    R_end = np.asarray(so3.so3_exp_matrix(jnp.asarray(omega * 0.1)))
    expected = np.tile(R_end.T @ p_world, (4, 1))
    np.testing.assert_allclose(np.asarray(pts_out), expected, atol=2e-4)


def test_padding_invariance():
    """Extra masked-out IMU slots must not change the result."""
    x = make_state()._replace(vel=jnp.asarray([1.0, 0, 0], DT))
    n = 9
    t = np.linspace(0.0, 0.08, n)
    acc = np.tile([0.1, 0, st.S2_LENGTH], (n, 1))
    gyr = np.tile([0.0, 0.0, 0.5], (n, 1))
    pts = np.random.default_rng(3).normal(size=(6, 3))
    ptt = np.linspace(0, 0.08, 6)

    def padded(M):
        imu_t = np.concatenate([t, np.full(M - n, t[-1])])
        mask = np.arange(M) < n
        A = np.concatenate([acc, np.full((M - n, 3), 777.0)])
        G = np.concatenate([gyr, np.full((M - n, 3), -555.0)])
        return run_prop(x, imu_t, A, G, mask, 0.0, 0.08, pts=pts, ptt=ptt)

    xa, Pa, oa, _ = padded(12)
    xb, Pb, ob, _ = padded(32)
    np.testing.assert_allclose(
        np.asarray(st.boxminus(xa, xb)), 0.0, atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pb), atol=1e-12)
    np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=1e-12)
