"""Composed 23-DOF state manifold: boxplus/boxminus consistency."""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu import state as st
from fast_lio_tpu.math import so3

RNG = np.random.default_rng(2)


def rand_state():
    s = st.identity_state(jnp.float64)
    dx = jnp.asarray(RNG.normal(size=23) * 0.5)
    return st.boxplus(s, dx)


def test_boxplus_boxminus_roundtrip():
    for _ in range(8):
        s = rand_state()
        dx = jnp.asarray(RNG.normal(size=23) * 0.3)
        s2_ = st.boxplus(s, dx)
        dx2 = st.boxminus(s2_, s)
        np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-8)


def test_boxminus_self_is_zero():
    s = rand_state()
    np.testing.assert_allclose(np.asarray(st.boxminus(s, s)), 0.0, atol=1e-10)


def test_oplus_matches_euler_step():
    """oplus with a dynamics vector must advance pos/vel additively and the
    rotation multiplicatively, with gravity untouched for zero grav-rows."""
    s = rand_state()
    f = jnp.asarray(RNG.normal(size=24))
    f = f.at[st.IDX_GRAV : st.IDX_GRAV + 3].set(0.0)
    dt = 0.01
    s2_ = st.oplus(s, f, dt)
    np.testing.assert_allclose(
        np.asarray(s2_.pos), np.asarray(s.pos + f[0:3] * dt), atol=1e-12
    )
    np.testing.assert_allclose(np.asarray(s2_.grav), np.asarray(s.grav), atol=1e-12)
    expect_rot = so3.quat_multiply(s.rot, so3.so3_exp(f[3:6] * dt))
    np.testing.assert_allclose(np.asarray(s2_.rot), np.asarray(expect_rot), atol=1e-12)


def test_grav_block_is_2dof():
    s = rand_state()
    dx = jnp.zeros(23).at[st.IDX_GRAV].set(0.1).at[st.IDX_GRAV + 1].set(-0.05)
    s2_ = st.boxplus(s, dx)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(s2_.grav)), st.S2_LENGTH, atol=1e-9
    )
