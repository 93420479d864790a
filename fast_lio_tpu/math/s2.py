"""S^2 manifold (gravity direction on a sphere of radius G).

TPU-native re-implementation of the reference's S2 manifold
(/root/reference/include/IKFoM_toolkit/mtk/types/S2.hpp:97-310), which stores a
3-vector of fixed length ``length`` (= G = 9.809 for ``MTK::S2<double, 98090,
10000, 1>``, use-ikfom.hpp:8) with a 2-DOF tangent space.

The reference hard-codes ``S2_typ``; FAST-LIO uses ``S2_typ = 1`` (x-axis
default seed), but only the ``S2_Bx`` basis depends on it.  We implement the
``S2_typ = 1`` basis to match (S2.hpp:215-231).

Deviation from the reference (documented, deliberate): the reference's
``S2_Mx`` computes its exp factor with ``scalar(1/2)`` — a C++ integer
division that yields 0, silently turning ``exp(Bx delta)`` into identity
(S2.hpp:277).  We implement the mathematically intended version with the exp
factor included; the difference is O(|delta|) with |delta| ~ 1e-3 in practice.

All functions take/return plain jnp arrays; ``vec`` is the (…, 3) point on the
sphere; tangent deltas are (…, 2).
"""
from __future__ import annotations

import jax.numpy as jnp

from .so3 import A_matrix, hat, quat_rotate, so3_exp

__all__ = ["bx", "boxplus", "boxminus", "nx_yy", "mx", "oplus"]

_TOL = 1e-11


def bx(vec: jnp.ndarray, length: float) -> jnp.ndarray:
    """Tangent basis (…,3,2) at ``vec``; S2_typ=1 branch of S2.hpp:215-231.

    Columns are orthogonal to vec; degenerate branch when vec ~ -length*e_x.
    """
    v0, v1, v2 = vec[..., 0], vec[..., 1], vec[..., 2]
    denom_raw = length + v0
    ok = denom_raw > _TOL
    denom = jnp.where(ok, denom_raw, 1.0)
    r0 = jnp.stack([-v1, -v2], axis=-1)
    r1 = jnp.stack([length - v1 * v1 / denom, -v2 * v1 / denom], axis=-1)
    r2 = jnp.stack([-v2 * v1 / denom, length - v2 * v2 / denom], axis=-1)
    res = jnp.stack([r0, r1, r2], axis=-2) / length

    degen = jnp.zeros_like(res)
    degen = degen.at[..., 1, 1].set(-1.0)
    degen = degen.at[..., 2, 0].set(1.0)
    return jnp.where(ok[..., None, None], res, degen)


def boxplus(vec: jnp.ndarray, delta: jnp.ndarray, length: float) -> jnp.ndarray:
    """vec ⊞ delta: rotate vec by exp(Bx(vec) @ delta).  S2.hpp:136-142."""
    Bu = jnp.einsum("...ij,...j->...i", bx(vec, length), delta)
    q = so3_exp(Bu)
    return quat_rotate(q, vec)


def oplus(vec: jnp.ndarray, delta3: jnp.ndarray, scale) -> jnp.ndarray:
    """DIM-space retraction used by predict: rotate vec by exp(scale*delta3).

    S2.hpp:129-134.  (For FAST-LIO the gravity rows of f are zero, so this is
    identity in the pipeline; kept for engine completeness.)
    """
    q = so3_exp(delta3 * scale)
    return quat_rotate(q, vec)


def boxminus(vec: jnp.ndarray, other: jnp.ndarray, length: float) -> jnp.ndarray:
    """(…,2) tangent difference this ⊟ other.  S2.hpp:144-167.

    theta = atan2(|other x this|, other . this); res = theta/sin(theta) *
    Bx(other)^T hat(other) this, with the antipodal/zero guards of the
    reference (res = [pi, 0] when antipodal, 0 when equal).
    """
    cross = jnp.cross(vec, other)  # hat(vec) @ other
    v_sin = jnp.linalg.norm(cross, axis=-1)
    v_cos = jnp.sum(vec * other, axis=-1)
    theta = jnp.arctan2(v_sin, v_cos)

    safe_sin = jnp.maximum(v_sin, _TOL)
    Bx_other = bx(other, length)
    # hat(other) @ vec = other x vec
    oxv = jnp.cross(other, vec)
    general = (theta / safe_sin)[..., None] * jnp.einsum(
        "...ij,...i->...j", Bx_other, oxv
    )

    degenerate = v_sin < _TOL
    antipodal = jnp.abs(theta) > _TOL
    pi_res = jnp.stack(
        [jnp.full_like(theta, 3.1415926), jnp.zeros_like(theta)], axis=-1
    )
    zero_res = jnp.zeros_like(pi_res)
    special = jnp.where(antipodal[..., None], pi_res, zero_res)
    return jnp.where(degenerate[..., None], special, general)


def nx_yy(vec: jnp.ndarray, length: float) -> jnp.ndarray:
    """N(x, x): (…,2,3) = 1/len^2 * Bx^T hat(vec).  S2.hpp:259-264."""
    Bx = bx(vec, length)
    return jnp.einsum("...ij,...ik->...jk", Bx, hat(vec)) / (length * length)


def mx(vec: jnp.ndarray, delta: jnp.ndarray, length: float) -> jnp.ndarray:
    """M(x, delta): (…,3,2) derivative of boxplus wrt delta.  S2.hpp:266-280.

    res = -exp(Bx delta) hat(vec) A(Bx delta)^T Bx  (delta -> 0 gives
    -hat(vec) Bx).  Note: we include the exp factor the reference's integer-
    division bug drops; see module docstring.
    """
    Bx = bx(vec, length)
    Bu = jnp.einsum("...ij,...j->...i", Bx, delta)
    small = jnp.sum(delta * delta, axis=-1) < _TOL * _TOL

    simple = -jnp.einsum("...ij,...jk->...ik", hat(vec), Bx)

    from .so3 import quat_to_matrix  # local import to avoid cycle at module load

    R = quat_to_matrix(so3_exp(Bu))
    At = jnp.swapaxes(A_matrix(Bu), -1, -2)
    general = -jnp.einsum("...ij,...jk,...kl,...lm->...im", R, hat(vec), At, Bx)
    return jnp.where(small[..., None, None], simple, general)
