"""Batched 5-point plane fitting.

TPU-native equivalent of ``esti_plane`` (/root/reference/include/common_lib.h:
225-257): fit a plane to NUM_MATCH_POINTS neighbors, return unit normal +
offset (pabcd), reject when any neighbor sits farther than ``threshold``
(0.1 m) from the plane.

Design deltas for TPU (deliberate, documented):
* The reference solves the unit-RHS least-squares system ``A n = -1`` with a
  per-point Householder QR.  That formulation is not translation invariant
  and conditions like |p|^2 / spread^2 — for points 100 m out it loses ~8
  digits, fatal in f32.  We instead compute the orthogonal-regression plane
  through the neighborhood centroid (smallest eigenvector of the centered
  scatter), which is translation invariant, batched as three fused matmuls +
  a closed-form 3x3 solve, and agrees with the reference's plane to O(res^2)
  for any neighborhood that passes the 0.1 m residual gate.  The plane's
  sign may differ from the reference's; that cancels in H^T H and H^T h.
* The smallest eigenvector comes from two inverse-iteration steps (Tikhonov-
  shifted adjugate solves) seeded by an edge cross product — exact for true
  planes, no eigendecomposition needed.
* Everything is unrolled elementwise over the K=5 neighbor axis (no einsum/
  matmul): the (N, K, 3) x (N, K, 3) -> (N, 3, 3) batched-matmul form costs
  0.47 ms at N=4096 on TPU v5e (tiny contractions lower badly), while the
  unrolled VPU form fuses with its producers and is below measurement noise.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _solve3x3_sym(M: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched symmetric 3x3 solve via adjugate.  Returns (x, det)."""
    a, d, g = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    e, h = M[..., 1, 1], M[..., 1, 2]
    i = M[..., 2, 2]
    c00 = e * i - h * h
    c01 = g * h - d * i
    c02 = d * h - e * g
    det = a * c00 + d * c01 + g * c02
    c11 = a * i - g * g
    c12 = d * g - a * h
    c22 = a * e - d * d
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
    x0 = (c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1), det


def fit_plane(
    neighbors: jnp.ndarray,  # (N, K, 3)
    found: jnp.ndarray,  # (N, K) bool
    threshold: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (pabcd (N, 4), ok (N,)).

    pabcd = (unit normal, offset): n . p + d ~ 0 across the K neighbors.
    ok requires all K neighbors present, a non-degenerate neighborhood, and
    every neighbor within ``threshold`` of the plane (common_lib.h:249-255).
    """
    all_found = jnp.all(found, axis=-1)

    centroid = jnp.mean(neighbors, axis=-2)  # (N, 3)
    A = neighbors - centroid[:, None, :]  # (N, K, 3)
    # centered scatter, elementwise over K (see module docstring)
    ax, ay, az = A[..., 0], A[..., 1], A[..., 2]  # (N, K)

    def dot(u, v):
        return jnp.sum(u * v, axis=-1)

    AtA = jnp.stack(
        [
            jnp.stack([dot(ax, ax), dot(ax, ay), dot(ax, az)], -1),
            jnp.stack([dot(ax, ay), dot(ay, ay), dot(ay, az)], -1),
            jnp.stack([dot(ax, az), dot(ay, az), dot(az, az)], -1),
        ],
        axis=-2,
    )  # (N, 3, 3)

    # seed normal: cross of two neighborhood edges
    e1 = neighbors[:, 1, :] - neighbors[:, 0, :]
    e2 = neighbors[:, 2, :] - neighbors[:, 0, :]
    seed = jnp.cross(e1, e2)
    seed_norm = jnp.linalg.norm(seed, axis=-1)
    n_vec = seed / jnp.where(seed_norm > 1e-20, seed_norm, 1.0)[:, None]

    # inverse iteration toward the smallest eigenvector of AtA
    trace = AtA[..., 0, 0] + AtA[..., 1, 1] + AtA[..., 2, 2]
    shift = (1e-6 * trace + 1e-12)[..., None, None] * jnp.eye(3, dtype=AtA.dtype)
    M = AtA + shift
    for _ in range(2):
        n_vec, _det = _solve3x3_sym(M, n_vec)
        nn = jnp.linalg.norm(n_vec, axis=-1, keepdims=True)
        n_vec = n_vec / jnp.where(nn > 1e-20, nn, 1.0)

    d = -jnp.sum(n_vec * centroid, axis=-1)
    pabcd = jnp.concatenate([n_vec, d[:, None]], axis=-1)

    res = jnp.abs(jnp.sum(neighbors * n_vec[:, None, :], axis=-1) + d[:, None])
    ok_res = jnp.all(res <= threshold, axis=-1)
    ok_geom = jnp.logical_and(seed_norm > 1e-12, trace > 1e-12)
    return pabcd, all_found & ok_geom & ok_res
