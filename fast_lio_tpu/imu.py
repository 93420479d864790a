"""IMU processing: static initialization, forward propagation, motion deskew.

TPU-native re-design of /root/reference/src/IMU_Processing.hpp:

* ``init_stats`` / ``make_init_state`` — static initialization: running
  mean/cov of acc & gyro, gravity/bias seeding, initial covariance
  (IMU_Processing.hpp:159-214).  Runs host-side once (numpy), like the
  reference's start-up path.
* ``propagate_and_deskew`` — the jitted per-scan kernel fusing
  - forward propagation per IMU interval (IMU_Processing.hpp:243-301) as a
    ``lax.scan`` over a fixed-size padded IMU block, emitting per-knot poses
    (the Pose6D cache, msg/Pose6D.msg, common_lib.h:168-183), and
  - backward per-point motion compensation (IMU_Processing.hpp:307-345)
    re-designed as a vectorized gather: per-point segment lookup via
    ``searchsorted`` over knot times + closed-form pose interpolation,
    replacing the reference's backward pointer walk.

Padding contract for the IMU block (length M):
  slot 0 is the previous frame's tail sample (the reference's
  ``v_imu.push_front(last_imu_)``, IMU_Processing.hpp:220); ``imu_mask[i]``
  marks real samples; masked-out slots must come after all real ones and have
  nondecreasing times.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import state as st
from .filter import ekf
from .math import so3

_FAR_FUTURE = 1e9


class InitStats(NamedTuple):
    """Host-side running statistics for static initialization."""

    n: int
    mean_acc: np.ndarray
    mean_gyr: np.ndarray
    cov_acc: np.ndarray
    cov_gyr: np.ndarray


def empty_stats() -> InitStats:
    return InitStats(
        n=0,
        mean_acc=np.array([0.0, 0.0, -1.0]),
        mean_gyr=np.zeros(3),
        cov_acc=np.full(3, 0.1),
        cov_gyr=np.full(3, 0.1),
    )


def update_stats(stats: InitStats, acc: np.ndarray, gyr: np.ndarray) -> InitStats:
    """Accumulate one frame of IMU samples (IMU_Processing.hpp:178-194).

    acc/gyr: (k, 3) raw samples.  First-ever call seeds the means from the
    first sample (b_first_frame_ branch, :166-176).
    """
    n = stats.n
    mean_acc, mean_gyr = stats.mean_acc.copy(), stats.mean_gyr.copy()
    cov_acc, cov_gyr = stats.cov_acc.copy(), stats.cov_gyr.copy()
    start = 0
    if n == 0:
        mean_acc = acc[0].astype(float).copy()
        mean_gyr = gyr[0].astype(float).copy()
        n = 1
    for i in range(start, len(acc)):
        mean_acc += (acc[i] - mean_acc) / n
        mean_gyr += (gyr[i] - mean_gyr) / n
        cov_acc = cov_acc * (n - 1.0) / n + (acc[i] - mean_acc) ** 2 * (n - 1.0) / n**2
        cov_gyr = cov_gyr * (n - 1.0) / n + (gyr[i] - mean_gyr) ** 2 * (n - 1.0) / n**2
        n += 1
    return InitStats(n, mean_acc, mean_gyr, cov_acc, cov_gyr)


def make_init_state(
    stats: InitStats,
    ext_R: np.ndarray,
    ext_T: np.ndarray,
    dtype=jnp.float32,
) -> Tuple[st.State, jnp.ndarray]:
    """Initial (state, P) after static init (IMU_Processing.hpp:195-211)."""
    x = st.identity_state(dtype)
    grav = -stats.mean_acc / np.linalg.norm(stats.mean_acc) * st.G_M_S2
    x = x._replace(
        grav=st.normalize_grav(jnp.asarray(grav, dtype)),
        bg=jnp.asarray(stats.mean_gyr, dtype),
        offset_R_L_I=so3.matrix_to_quat(jnp.asarray(ext_R, dtype)),
        offset_T_L_I=jnp.asarray(ext_T, dtype),
    )
    P = np.eye(st.DOF)
    P[6:9, 6:9] *= 1e-5  # extrinsic rot
    P[9:12, 9:12] *= 1e-5  # extrinsic trans
    P[15:18, 15:18] *= 1e-4  # bg
    P[18:21, 18:21] *= 1e-3  # ba
    P[21:23, 21:23] *= 1e-5  # grav
    return x, jnp.asarray(P, dtype)


class ImuCarry(NamedTuple):
    """Cross-frame IMU state (the reference's angvel_last / acc_s_last,
    IMU_Processing.hpp:78-79).  The reference also carries
    last_lidar_end_time; that stays on the HOST (absolute epoch seconds do
    not survive f32 on device — all kernel times are scan-relative)."""

    angvel_last: jnp.ndarray  # (3,)
    acc_s_last: jnp.ndarray  # (3,)


def init_imu_carry(dtype=jnp.float32) -> ImuCarry:
    z = jnp.zeros(3, dtype=dtype)
    return ImuCarry(z, z)


def propagate_and_deskew(
    x: st.State,
    P: jnp.ndarray,
    Q: jnp.ndarray,
    imu_t: jnp.ndarray,  # (M,) seconds RELATIVE to scan begin
    imu_acc: jnp.ndarray,  # (M, 3)
    imu_gyr: jnp.ndarray,  # (M, 3)
    imu_mask: jnp.ndarray,  # (M,) bool
    acc_scale: jnp.ndarray,  # () G / |mean_acc|  (IMU_Processing.hpp:266)
    last_end_rel: jnp.ndarray,  # () previous scan end, relative to scan begin
    pcl_end_rel: jnp.ndarray,  # () scan end, relative to scan begin
    carry: ImuCarry,
    pts: jnp.ndarray,  # (N, 3) LiDAR-frame points
    pt_time: jnp.ndarray,  # (N,) per-point offset from scan begin, SECONDS
    deskew: bool = True,
):
    """Forward-propagate through the IMU block and deskew the scan.

    Returns (x_end, P_end, pts_out, new_carry).  All points end up in the
    scan-end LiDAR frame (IMU_Processing.hpp:323-343).
    """
    dtype = P.dtype
    M = imu_t.shape[0]

    rel_t = imu_t.astype(dtype)  # (M,)
    rel_last_end = last_end_rel.astype(dtype)
    rel_pcl_end = pcl_end_rel.astype(dtype)

    pair_tail_mask = imu_mask[1:]  # tail sample must be real
    head_t = rel_t[:-1]
    tail_t = rel_t[1:]
    not_stale = tail_t >= rel_last_end  # skip pre-scan leftovers (:255)
    pair_valid = jnp.logical_and(pair_tail_mask, not_stale)

    angvel_avr = 0.5 * (imu_gyr[:-1] + imu_gyr[1:]).astype(dtype)
    acc_avr = 0.5 * (imu_acc[:-1] + imu_acc[1:]).astype(dtype) * acc_scale
    dts = tail_t - jnp.maximum(head_t, rel_last_end)  # (:268-276)
    dts = jnp.where(pair_valid, jnp.maximum(dts, 0.0), 0.0)

    # ---- forward propagation, batched (no sequential scan) ----------------
    # Each predict is forward-Euler at the pre-state (st.oplus), so the whole
    # chain is computable in parallel: the quaternion chain is an associative
    # product, vel/pos are cumulative sums once the per-interval rotations are
    # known, and P's recursion P <- F P F^T + Fw Q Fw^T composes associatively
    # as (F2, Q2) ∘ (F1, Q1) = (F2 F1, F2 Q1 F2^T + Q2).  Invalid pairs have
    # dt == 0 and are forced to exact identity elements, so padding slots are
    # no-ops (the reference walks IMU samples one by one,
    # IMU_Processing.hpp:243-296 — same math, log depth instead of M).
    Mp = M - 1
    with jax.default_matmul_precision("highest"):
        omega = angvel_avr - x.bg  # (Mp, 3)
        a_body = acc_avr - x.ba  # (Mp, 3)
        dq = so3.so3_exp(omega * dts[:, None])  # identity where dt == 0
        q_incl = jax.lax.associative_scan(so3.quat_multiply, dq)
        q_after = so3.quat_multiply(x.rot[None, :], q_incl)  # (Mp, 4)
        q_before = jnp.concatenate([x.rot[None, :], q_after[:-1]], axis=0)

        a_w_int = so3.quat_rotate(q_before, a_body) + x.grav  # pre-state f_vel
        vel_after = x.vel + jnp.cumsum(a_w_int * dts[:, None], axis=0)
        vel_before = jnp.concatenate([x.vel[None, :], vel_after[:-1]], axis=0)
        pos_after = x.pos + jnp.cumsum(vel_before * dts[:, None], axis=0)
        pos_before = jnp.concatenate([x.pos[None, :], pos_after[:-1]], axis=0)

        def bcast(v):
            return jnp.broadcast_to(v, (Mp,) + v.shape)

        x_pre = st.State(
            pos=pos_before, rot=q_before,
            offset_R_L_I=bcast(x.offset_R_L_I),
            offset_T_L_I=bcast(x.offset_T_L_I),
            vel=vel_before, bg=bcast(x.bg), ba=bcast(x.ba),
            grav=bcast(x.grav),
        )
        F, Fw, _f = jax.vmap(ekf.predict_matrices)(
            x_pre, dts, acc_avr, angvel_avr
        )
        G = jnp.einsum("mij,jk,mlk->mil", Fw, Q.astype(dtype), Fw)
        eyeD = jnp.eye(st.DOF, dtype=dtype)
        F = jnp.where(pair_valid[:, None, None], F, eyeD)
        G = jnp.where(pair_valid[:, None, None], G, jnp.zeros_like(G))

        def compose(a, b):  # a precedes b
            Fa, Ga = a
            Fb, Gb = b
            FbT = jnp.swapaxes(Fb, -1, -2)
            return Fb @ Fa, Fb @ Ga @ FbT + Gb

        F_tot, G_tot = jax.tree.map(
            lambda arr: arr[-1], jax.lax.associative_scan(compose, (F, G))
        )
        P_prop = F_tot @ P @ F_tot.T + G_tot
        P_prop = 0.5 * (P_prop + P_prop.T)

    # forward-fill knot gyr/acc over invalid pairs (the reference's
    # angvel_last / acc_s_last carry, IMU_Processing.hpp:290-295)
    steps = jnp.arange(Mp)
    last_valid = jax.lax.associative_scan(
        jnp.maximum, jnp.where(pair_valid, steps, -1)
    )

    def ffill(vals, init):
        picked = vals[jnp.clip(last_valid, 0, Mp - 1)]
        return jnp.where((last_valid >= 0)[:, None], picked, init[None, :])

    knot_gyr_v = ffill(omega, carry.angvel_last.astype(dtype))
    a_w_knot = so3.quat_rotate(q_after, a_body) + x.grav  # post-state frame
    knot_acc_v = ffill(a_w_knot, carry.acc_s_last.astype(dtype))
    last_in = ffill(
        jnp.concatenate([acc_avr, angvel_avr], axis=-1),
        jnp.zeros(6, dtype=dtype),
    )[-1]

    # knot offset times: valid -> tail offset; stale-prefix -> 0;
    # padding tail -> +inf so searchsorted never selects them as head.
    knot_offsets = jnp.where(
        pair_valid, tail_t, jnp.where(pair_tail_mask, 0.0, _FAR_FUTURE)
    )

    # prepend the scan-begin knot (IMU_Processing.hpp:241)
    def prepend(k0, arr):
        return jnp.concatenate([k0[None], arr], axis=0)

    knot_t = prepend(jnp.asarray(0.0, dtype), knot_offsets)  # (M,)
    knot_rot = prepend(x.rot, q_after)
    knot_pos = prepend(x.pos, pos_after)
    knot_vel = prepend(x.vel, vel_after)
    knot_gyr = prepend(carry.angvel_last.astype(dtype), knot_gyr_v)
    knot_acc = prepend(carry.acc_s_last.astype(dtype), knot_acc_v)

    x_prop = x._replace(pos=pos_after[-1], rot=q_after[-1], vel=vel_after[-1])

    # final fractional predict to scan end (IMU_Processing.hpp:298-301)
    imu_end_rel = jnp.max(jnp.where(imu_mask, rel_t, -jnp.inf))
    dt_final = rel_pcl_end - imu_end_rel
    x_end, P_end = ekf.predict(x=x_prop, P=P_prop, dt=dt_final, Q=Q,
                               acc=last_in[:3], gyro=last_in[3:])

    new_carry = ImuCarry(angvel_last=knot_gyr_v[-1], acc_s_last=knot_acc_v[-1])

    if not deskew:  # MARSIM bypass (IMU_Processing.hpp:310)
        return x_end, P_end, pts, new_carry

    # ---- backward compensation as a vectorized gather ----
    # (all rotations via quaternions: elementwise VPU math keeps full f32 on
    # TPU where batched matmuls would default to bf16 inputs)
    t_p = pt_time.astype(dtype)  # (N,)
    head = jnp.clip(
        jnp.searchsorted(knot_t, t_p, side="left") - 1, 0, M - 2
    )
    tail = head + 1
    q_head = knot_rot[head]  # (N,4)
    pos_head = knot_pos[head]
    vel_head = knot_vel[head]
    acc_tail = knot_acc[tail]
    gyr_tail = knot_gyr[tail]
    dt_p = (t_p - knot_t[head])[:, None]  # (N,1)

    q_i = so3.quat_multiply(q_head, so3.so3_exp(gyr_tail * dt_p))  # (N,4)
    T_ei = pos_head + vel_head * dt_p + 0.5 * acc_tail * dt_p * dt_p - x_end.pos

    p_lidar_i = so3.quat_rotate(x_end.offset_R_L_I, pts) + x_end.offset_T_L_I
    p_world_rel = so3.quat_rotate(q_i, p_lidar_i) + T_ei
    p_imu_e = so3.quat_rotate(so3.quat_conjugate(x_end.rot), p_world_rel)
    pts_out = so3.quat_rotate(
        so3.quat_conjugate(x_end.offset_R_L_I), p_imu_e - x_end.offset_T_L_I
    )
    return x_end, P_end, pts_out, new_carry
