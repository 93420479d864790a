"""S^2 manifold: boxplus/boxminus inverses and the Nx/Mx chain-rule identity
the filter's gravity-block tangent transport depends on (esekfom.hpp:1687-1691).
"""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu.math import s2

L = 9.809
RNG = np.random.default_rng(1)


def rand_sphere(n=None):
    shape = (3,) if n is None else (n, 3)
    v = RNG.normal(size=shape)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True) * L
    return jnp.asarray(v)


def test_bx_columns_tangent_and_orthonormal():
    v = rand_sphere(32)
    B = s2.bx(v, L)
    # columns orthogonal to v
    np.testing.assert_allclose(np.asarray(jnp.einsum("ni,nij->nj", v, B)), 0.0, atol=1e-9)
    # B^T B = I (orthonormal basis)
    BtB = jnp.einsum("nij,nik->njk", B, B)
    np.testing.assert_allclose(np.asarray(BtB), np.broadcast_to(np.eye(2), (32, 2, 2)), atol=1e-9)


def test_bx_degenerate_branch():
    v = jnp.asarray([-L, 0.0, 0.0])
    B = np.asarray(s2.bx(v, L))
    expected = np.zeros((3, 2))
    expected[1, 1] = -1.0
    expected[2, 0] = 1.0
    np.testing.assert_allclose(B, expected, atol=0)


def test_boxplus_stays_on_sphere():
    v = rand_sphere(16)
    d = jnp.asarray(RNG.normal(size=(16, 2)) * 0.3)
    v2 = s2.boxplus(v, d, L)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(v2, axis=-1)), L, atol=1e-9)


def test_boxminus_inverts_boxplus():
    v = rand_sphere(16)
    d = jnp.asarray(RNG.normal(size=(16, 2)) * 0.2)
    v2 = s2.boxplus(v, d, L)
    d2 = s2.boxminus(v2, v, L)
    # boxminus returns the tangent delta expressed in Bx(v); boxplus(v, d2) == v2
    v3 = s2.boxplus(v, d2, L)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(v2), atol=1e-8)


def test_boxminus_zero_and_antipodal():
    v = rand_sphere()
    np.testing.assert_allclose(np.asarray(s2.boxminus(v, v, L)), 0.0, atol=1e-12)
    d = np.asarray(s2.boxminus(-v, v, L))
    np.testing.assert_allclose(d, [3.1415926, 0.0], atol=1e-6)


def test_nxyy_mx_chain_rule():
    """d/dd [ (y boxplus d) boxminus x ] at d=d0  ==  Nx_yy(x) @ Mx(y, d0)
    with x = y boxplus d0 — the exact product the modified iterated update
    uses to transport dx and P between tangent frames
    (esekfom.hpp:1687-1691: x_.S2_Nx_yy * x_propagated.S2_Mx(seg))."""
    eps = 1e-6
    for _ in range(6):
        y = rand_sphere()
        d0 = jnp.asarray(RNG.normal(size=2) * 0.3)
        x = s2.boxplus(y, d0, L)

        J = np.zeros((2, 2))
        for k in range(2):
            dd = np.zeros(2)
            dd[k] = eps
            p = s2.boxminus(s2.boxplus(y, d0 + jnp.asarray(dd), L), x, L)
            m = s2.boxminus(s2.boxplus(y, d0 - jnp.asarray(dd), L), x, L)
            J[:, k] = np.asarray(p - m) / (2 * eps)

        NM = np.asarray(s2.nx_yy(x, L) @ s2.mx(y, d0, L))
        np.testing.assert_allclose(NM, J, atol=2e-3)


def test_nx_yy_times_mx_zero_is_identity():
    """Nx(y,y) @ Mx(y, 0) = I_2 — the predict-step S2 diagonal block
    (esekfom.hpp:347-357 with zero gravity dynamics)."""
    y = rand_sphere(8)
    NM = np.asarray(
        jnp.einsum("nij,njk->nik", s2.nx_yy(y, L), s2.mx(y, jnp.zeros((8, 2)), L))
    )
    np.testing.assert_allclose(NM, np.broadcast_to(np.eye(2), (8, 2, 2)), atol=1e-9)


def test_mx_is_boxplus_jacobian():
    """Mx(y, d0) == d/dd boxplus(y, d) at d0 (3x2, ambient output)."""
    eps = 1e-6
    for _ in range(4):
        y = rand_sphere()
        d0 = jnp.asarray(RNG.normal(size=2) * 0.4)
        J = np.zeros((3, 2))
        for k in range(2):
            dd = np.zeros(2)
            dd[k] = eps
            p = s2.boxplus(y, d0 + jnp.asarray(dd), L)
            m = s2.boxplus(y, d0 - jnp.asarray(dd), L)
            J[:, k] = np.asarray(p - m) / (2 * eps)
        np.testing.assert_allclose(np.asarray(s2.mx(y, d0, L)), J, atol=5e-5)
