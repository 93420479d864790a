"""Process model of the LiDAR-inertial system.

TPU-native equivalent of /root/reference/include/use-ikfom.hpp:28-88:
``get_f`` (24-dim flattened dynamics), ``df_dx`` (24x23), ``df_dw`` (24x12)
and the 12x12 process-noise covariance.

State dynamics (use-ikfom.hpp:47-59):
    d pos   = vel
    d theta = omega            (omega = gyro - bg)
    d vel   = R (acc - ba) + grav
    biases, extrinsics, gravity: random walk via noise only.

Noise vector layout (process_noise_ikfom, use-ikfom.hpp:28-33):
    [0:3] gyro noise  [3:6] acc noise  [6:9] gyro-bias walk  [9:12] acc-bias walk
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import state as st
from ..math import s2, so3


def f_dynamics(s: st.State, acc: jnp.ndarray, gyro: jnp.ndarray) -> jnp.ndarray:
    """Flattened dynamics vector (24,).  use-ikfom.hpp:47-59."""
    omega = gyro - s.bg
    a_inertial = so3.quat_rotate(s.rot, acc - s.ba) + s.grav
    f = jnp.zeros(st.DIM, dtype=s.dtype)
    f = f.at[st.IDX_POS : st.IDX_POS + 3].set(s.vel)
    f = f.at[st.IDX_ROT : st.IDX_ROT + 3].set(omega)
    f = f.at[st.IDX_VEL : st.IDX_VEL + 3].set(a_inertial)
    return f


def df_dx(s: st.State, acc: jnp.ndarray, gyro: jnp.ndarray) -> jnp.ndarray:
    """(24, 23) Jacobian of f wrt the error state.  use-ikfom.hpp:61-77."""
    dtype = s.dtype
    R = so3.quat_to_matrix(s.rot)
    J = jnp.zeros((st.DIM, st.DOF), dtype=dtype)
    eye = jnp.eye(3, dtype=dtype)
    J = J.at[st.IDX_POS : st.IDX_POS + 3, st.IDX_VEL : st.IDX_VEL + 3].set(eye)
    J = J.at[st.IDX_VEL : st.IDX_VEL + 3, st.IDX_ROT : st.IDX_ROT + 3].set(
        -R @ so3.hat(acc - s.ba)
    )
    J = J.at[st.IDX_VEL : st.IDX_VEL + 3, st.IDX_BA : st.IDX_BA + 3].set(-R)
    grav_matrix = s2.mx(s.grav, jnp.zeros(2, dtype=dtype), st.S2_LENGTH)
    J = J.at[st.IDX_VEL : st.IDX_VEL + 3, st.IDX_GRAV : st.IDX_GRAV + 2].set(
        grav_matrix
    )
    J = J.at[st.IDX_ROT : st.IDX_ROT + 3, st.IDX_BG : st.IDX_BG + 3].set(-eye)
    return J


def df_dw(s: st.State) -> jnp.ndarray:
    """(24, 12) Jacobian of f wrt process noise.  use-ikfom.hpp:80-88."""
    dtype = s.dtype
    R = so3.quat_to_matrix(s.rot)
    J = jnp.zeros((st.DIM, st.NOISE_DOF), dtype=dtype)
    eye = jnp.eye(3, dtype=dtype)
    J = J.at[st.IDX_ROT : st.IDX_ROT + 3, 0:3].set(-eye)
    J = J.at[st.IDX_VEL : st.IDX_VEL + 3, 3:6].set(-R)
    J = J.at[st.IDX_BG : st.IDX_BG + 3, 6:9].set(eye)
    J = J.at[st.IDX_BA : st.IDX_BA + 3, 9:12].set(eye)
    return J


def process_noise_cov(
    gyr_cov, acc_cov, b_gyr_cov, b_acc_cov, dtype=jnp.float32
) -> jnp.ndarray:
    """12x12 diagonal Q (IMU_Processing.hpp:280-283; defaults use-ikfom.hpp:35-43)."""
    diag = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.asarray(gyr_cov, dtype), (3,)),
            jnp.broadcast_to(jnp.asarray(acc_cov, dtype), (3,)),
            jnp.broadcast_to(jnp.asarray(b_gyr_cov, dtype), (3,)),
            jnp.broadcast_to(jnp.asarray(b_acc_cov, dtype), (3,)),
        ]
    )
    return jnp.diag(diag)
