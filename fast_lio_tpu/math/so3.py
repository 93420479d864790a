"""SO(3) primitives: quaternion exp/log, skew, rotation Jacobians.

TPU-native re-implementation of the reference math layer
(/root/reference/include/so3_math.h:9-109 and
/root/reference/include/IKFoM_toolkit/mtk/src/mtkmath.hpp:142-288,
/root/reference/include/IKFoM_toolkit/mtk/types/SOn.hpp:233-297).

Everything here is pure, shape-polymorphic jnp code: functions take arrays whose
leading dimensions broadcast, so the same code path serves a single state (the
filter core) and batched per-point kernels (vmap-free broadcasting).

Quaternion convention: ``(w, x, y, z)`` (scalar first).  The reference stores
Eigen coeffs ``(x, y, z, w)``; only IO shims need to reorder.

Numerical notes
---------------
* Small-angle branches use the standard "safe where" pattern (both branches
  computed on sanitized inputs) so gradients stay NaN-free under jit.
* The reference's ``MTK::log`` uses ``atan`` (plus/minus periodicity): q and -q
  map to the same rotation vector in (-pi, pi].  We reproduce that.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "hat",
    "quat_identity",
    "quat_multiply",
    "quat_conjugate",
    "quat_normalize",
    "quat_rotate",
    "quat_to_matrix",
    "matrix_to_quat",
    "so3_exp",
    "so3_log",
    "so3_exp_matrix",
    "A_matrix",
    "quat_to_euler_deg",
]

_SMALL = 1e-8  # squared-angle Taylor switch; safe for f32 and f64


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of v (..., 3) -> (..., 3, 3).

    Mirrors ``MTK::hat`` (mtkmath.hpp:176-183).
    """
    zeros = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def quat_identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product, (w,x,y,z) convention; broadcasts over leading dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by quaternion(s) q.  Broadcasts leading dims.

    Uses the 15-mul form r = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    u = q[..., 1:4]
    w = q[..., 0:1]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(…,4) quaternion -> (…,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rows = jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )
    return rows


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Robust (Shepperd) rotation-matrix -> quaternion, branch-free.

    Computes all four candidate quaternions and selects the one seeded by the
    largest of (trace, R00, R11, R22) — numerically stable for every rotation.
    """
    r00, r01, r02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    r10, r11, r12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    r20, r21, r22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = r00 + r11 + r22

    # candidate 0: seeded by trace
    q0 = jnp.stack([1.0 + tr, r21 - r12, r02 - r20, r10 - r01], axis=-1)
    # candidate 1: seeded by R00
    q1 = jnp.stack([r21 - r12, 1.0 + r00 - r11 - r22, r01 + r10, r02 + r20], axis=-1)
    # candidate 2: seeded by R11
    q2 = jnp.stack([r02 - r20, r01 + r10, 1.0 - r00 + r11 - r22, r12 + r21], axis=-1)
    # candidate 3: seeded by R22
    q3 = jnp.stack([r10 - r01, r02 + r20, r12 + r21, 1.0 - r00 - r11 + r22], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, r00, r11, r22], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


def _cos_sinc_half(theta2: jnp.ndarray):
    """cos(t/2) and sin(t/2)/(t) for t = sqrt(theta2), Taylor-guarded.

    Matches ``MTK::exp`` semantics with scale = 1/2 (mtkmath.hpp:249-256 via
    cos_sinc_sqrt of (theta/2)^2): returns (cos, sinc_half) with
    sinc_half = sin(t/2)/t  -> 1/2 as t -> 0.
    """
    safe2 = jnp.maximum(theta2, _SMALL)
    t = jnp.sqrt(safe2)
    cos_exact = jnp.cos(0.5 * t)
    sinc_exact = jnp.sin(0.5 * t) / t
    # Taylor: cos(t/2) ~ 1 - t^2/8 ; sin(t/2)/t ~ 1/2 - t^2/48
    cos_taylor = 1.0 - theta2 / 8.0
    sinc_taylor = 0.5 - theta2 / 48.0
    small = theta2 < _SMALL
    return jnp.where(small, cos_taylor, cos_exact), jnp.where(small, sinc_taylor, sinc_exact)


def so3_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (…,3) -> quaternion (…,4), q = exp(v).

    q = [cos(|v|/2), sinc-like * v].  Reference: SOn.hpp:284-288.
    """
    theta2 = jnp.sum(v * v, axis=-1)
    c, s = _cos_sinc_half(theta2)
    return jnp.concatenate([c[..., None], s[..., None] * v], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (…,4) -> rotation vector (…,3) in (-pi, pi].

    Matches ``MTK::log`` with plus_minus_periodicity=true and scale=2
    (mtkmath.hpp:268-288): result = (2/|vec|) * atan(|vec|/w) * vec, so q and
    -q give the same answer.
    """
    w = q[..., 0]
    vec = q[..., 1:4]
    nv2 = jnp.sum(vec * vec, axis=-1)
    nv = jnp.sqrt(jnp.maximum(nv2, _SMALL * _SMALL))
    small = nv2 < _SMALL * _SMALL
    # atan (not atan2): plus/minus periodicity. w==0 -> pi/2 handled by atan(inf)
    # guarded via where to keep division finite.
    safe_w = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
    angle_over_nv = jnp.where(
        small,
        2.0 / jnp.where(jnp.abs(w) < 1e-30, 1.0, w),  # lim atan(x/w)*2/x = 2/w
        2.0 * jnp.arctan(nv / safe_w) / nv,
    )
    return angle_over_nv[..., None] * vec


def so3_exp_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: rotation vector (…,3) -> matrix (…,3,3).

    Reference: so3_math.h:17-32 (``Exp``).
    """
    theta2 = jnp.sum(v * v, axis=-1)
    safe2 = jnp.maximum(theta2, _SMALL)
    t = jnp.sqrt(safe2)
    small = theta2 < _SMALL
    # sin(t)/t and (1-cos t)/t^2 with Taylor guards
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / safe2)
    K = hat(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + sinc[..., None, None] * K + cosc[..., None, None] * (K @ K)


def A_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """The SO(3) Jacobian-like matrix used by the filter's tangent transport.

    A(v) = I + (1-cos|v|)/|v|^2 hat(v) + (1 - sin|v|/|v|)/|v|^2 hat(v)^2.
    Reference: mtkmath.hpp:235-247.  A(v)^T is the right-Jacobian of SO(3).
    """
    theta2 = jnp.sum(v * v, axis=-1)
    safe2 = jnp.maximum(theta2, _SMALL)
    t = jnp.sqrt(safe2)
    small = theta2 < _SMALL
    c1 = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / safe2)
    c2 = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - jnp.sin(t) / t) / safe2)
    K = hat(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + c1[..., None, None] * K + c2[..., None, None] * (K @ K)


def quat_to_euler_deg(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> (roll, pitch, yaw) in degrees (factor 57.3, as reference).

    Mirrors ``SO3ToEuler`` (use-ikfom.hpp:90-124) including its 57.3 scale and
    singularity guards at |pitch| = 90 deg.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sqw, sqx, sqy, sqz = w * w, x * x, y * y, z * z
    unit = sqx + sqy + sqz + sqw
    test = w * y - z * x

    roll = jnp.arctan2(2 * (x * w + y * z), -sqx - sqy + sqz + sqw)
    pitch = jnp.arcsin(jnp.clip(2 * test / unit, -1.0, 1.0))
    yaw = jnp.arctan2(2 * (z * w + y * x), sqx - sqy - sqz + sqw)

    north = test > 0.49999 * unit
    south = test < -0.49999 * unit
    roll = jnp.where(north, 2 * jnp.arctan2(x, w), jnp.where(south, -2 * jnp.arctan2(x, w), roll))
    pitch = jnp.where(north, jnp.pi / 2, jnp.where(south, -jnp.pi / 2, pitch))
    yaw = jnp.where(north | south, jnp.zeros_like(yaw), yaw)
    return jnp.stack([roll, pitch, yaw], axis=-1) * 57.3
