"""On-manifold iterated error-state Kalman filter (iEKF) engine.

TPU-native re-design of the esekfom engine
(/root/reference/include/IKFoM_toolkit/esekfom/esekfom.hpp):

* ``predict`` — esekfom.hpp:279-383: mean via DIM-space retraction, covariance
  via per-block tangent-transported Jacobians.
* ``update_iterated`` — the *modified dyn-share* update
  (esekfom.hpp:1619-1931), the only variant FAST-LIO uses
  (laserMapping.cpp:960).  It exploits the FAST-LIO structure where the
  measurement Jacobian is nonzero only in the first 12 error-state columns,
  so the gain solve is a measurement-count-independent 23x23 problem and the
  ONLY reductions over the N measurement rows are H^T H (12x12) and H^T h
  (12,).  On TPU those are two masked matmuls; across a device mesh they are
  two ``psum``-able partials — which is exactly how the multi-device path
  shards the map (see fast_lio_tpu.parallel).

Everything is pure: ``(x, P) -> (x', P')``.  The measurement model is a
user-supplied traced callback, mirroring the reference's ``h_dyn_share``
inversion of control (esekfom.hpp:238-243) but functional: it returns masked
fixed-shape arrays instead of resizing Eigen matrices.

Design deltas vs the reference (documented deviations):
* Dense branch only: the reference's ``n > dof_Measurement`` branch
  (esekfom.hpp:1715-1744) is algebraically identical to the information form
  by the matrix-inversion lemma; with masked fixed-shape batches the 23x23
  form is always the right one on TPU.
* The reference computes its predict-step exp factors with ``scalar(1/2)`` —
  C++ integer division, i.e. scale 0 — which silently collapses
  ``exp(-f dt)`` to identity (esekfom.hpp:312,344).  We implement the
  mathematically intended factor (difference O(|omega| dt), ~1e-3).
* Solves use Cholesky factorization instead of explicit ``.inverse()``.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import state as st
from ..math import s2, so3
from . import process


class MeasOut(NamedTuple):
    """Output of the measurement-model callback (the h_dyn_share analog).

    Shapes are fixed; ``mask`` marks live rows.  ``valid`` is the reference's
    ``dyn_share.valid`` (False = zero effective points -> skip iteration,
    laserMapping.cpp:708-713).
    """

    h_x: jnp.ndarray  # (N, 12) masked Jacobian rows
    h: jnp.ndarray  # (N,)   masked residuals (z - h(x); reference h = -pd2)
    mask: jnp.ndarray  # (N,)   bool, row validity
    valid: jnp.ndarray  # ()     bool
    carry: Any  # opaque pytree threaded through iterations


MeasFn = Callable[[st.State, jnp.ndarray, Any], MeasOut]
# signature: (x_iterate, converge_flag, carry) -> MeasOut


# --------------------------------------------------------------------------
# predict
# --------------------------------------------------------------------------


def predict(
    x: st.State,
    P: jnp.ndarray,
    dt: jnp.ndarray,
    Q: jnp.ndarray,
    acc: jnp.ndarray,
    gyro: jnp.ndarray,
) -> Tuple[st.State, jnp.ndarray]:
    """One propagation step: x <- x.oplus(f dt);  P <- F P F^T + Fw Q Fw^T.

    Mirrors esekfom.hpp:279-383 specialized to the FAST-LIO manifold
    (static block structure unrolled at trace time).
    """
    with jax.default_matmul_precision("highest"):
        return _predict_impl(x, P, dt, Q, acc, gyro)


def predict_matrices(x: st.State, dt, acc, gyro):
    """(F (23,23), Fw (23,12)) of one predict step at pre-state ``x``.

    The gravity dynamics rows of f are identically zero (use-ikfom.hpp:47-59),
    so x_new.grav == x.grav exactly and both tangent frames of the S2 diagonal
    block are evaluated at ``x.grav``.  Depending only on the pre-state makes
    this vmappable — the batched IMU propagation (imu.propagate_and_deskew)
    builds all per-interval F/Fw in parallel and composes them in log depth.
    """
    dtype = x.dtype
    f = process.f_dynamics(x, acc, gyro)
    fx = process.df_dx(x, acc, gyro)  # (24, 23)
    fw = process.df_dw(x)  # (24, 12)

    # Row transport DIM -> DOF.  For FAST-LIO every vect block has equal
    # error/dim indices; SO3 rows are transformed by A(-f_seg dt); the S2 rows
    # of fx/fw are identically zero so their transport contributes nothing.
    fx_rows = fx[: st.DOF, :]  # drop the 24th (grav z) row; grav rows are zero
    fw_rows = fw[: st.DOF, :]

    F = jnp.eye(st.DOF, dtype=dtype)

    # vect rows pass through; SO3 rows get A(seg) with seg = -f_seg*dt
    def so3_row_transform(idx):
        seg = -f[idx : idx + 3] * dt
        return so3.A_matrix(seg)  # A(-v) == A(v)^T

    A_rot = so3_row_transform(st.IDX_ROT)
    A_ext = so3_row_transform(st.IDX_EXT_R)

    fx_t = fx_rows
    fx_t = fx_t.at[st.IDX_ROT : st.IDX_ROT + 3, :].set(
        A_rot @ fx_rows[st.IDX_ROT : st.IDX_ROT + 3, :]
    )
    fx_t = fx_t.at[st.IDX_EXT_R : st.IDX_EXT_R + 3, :].set(
        A_ext @ fx_rows[st.IDX_EXT_R : st.IDX_EXT_R + 3, :]
    )
    fw_t = fw_rows
    fw_t = fw_t.at[st.IDX_ROT : st.IDX_ROT + 3, :].set(
        A_rot @ fw_rows[st.IDX_ROT : st.IDX_ROT + 3, :]
    )
    fw_t = fw_t.at[st.IDX_EXT_R : st.IDX_EXT_R + 3, :].set(
        A_ext @ fw_rows[st.IDX_EXT_R : st.IDX_EXT_R + 3, :]
    )
    # S2 rows (21:23) of fx/fw: transported by -Nx exp(f dt) hat(grav) A^T
    # (esekfom.hpp:360-370) — identically zero for FAST-LIO since the gravity
    # dynamics rows vanish (use-ikfom.hpp:47-59).  Keep the grav DOF rows 0.
    fx_t = fx_t.at[st.IDX_GRAV : st.IDX_GRAV + 2, :].set(0.0)
    fw_t = fw_t.at[st.IDX_GRAV : st.IDX_GRAV + 2, :].set(0.0)

    # Diagonal manifold corrections on F (esekfom.hpp:303-357):
    # SO3 blocks: exp(-f_seg dt); S2 block: Nx(x_new) exp(f_seg dt) Mx(x_before)
    # with x_new.grav == x.grav (see docstring).
    F = F.at[st.IDX_ROT : st.IDX_ROT + 3, st.IDX_ROT : st.IDX_ROT + 3].set(
        so3.so3_exp_matrix(-f[st.IDX_ROT : st.IDX_ROT + 3] * dt)
    )
    F = F.at[st.IDX_EXT_R : st.IDX_EXT_R + 3, st.IDX_EXT_R : st.IDX_EXT_R + 3].set(
        so3.so3_exp_matrix(-f[st.IDX_EXT_R : st.IDX_EXT_R + 3] * dt)
    )
    seg_s2 = f[st.IDX_GRAV : st.IDX_GRAV + 3] * dt
    R_s2 = so3.so3_exp_matrix(seg_s2)
    Nx = s2.nx_yy(x.grav, st.S2_LENGTH)
    Mx = s2.mx(x.grav, jnp.zeros(2, dtype=dtype), st.S2_LENGTH)
    F = F.at[st.IDX_GRAV : st.IDX_GRAV + 2, st.IDX_GRAV : st.IDX_GRAV + 2].set(
        Nx @ R_s2 @ Mx
    )

    F = F + fx_t * dt
    Fw = fw_t * dt
    return F, Fw, f


def _predict_impl(x, P, dt, Q, acc, gyro):
    F, Fw, f = predict_matrices(x, dt, acc, gyro)
    x_new = st.oplus(x, f, dt)
    P_new = F @ P @ F.T + Fw @ Q @ Fw.T
    P_new = 0.5 * (P_new + P_new.T)  # keep P symmetric under f32 roundoff
    return x_new, P_new


# --------------------------------------------------------------------------
# tangent-frame transport helpers
# --------------------------------------------------------------------------


def _block_transform(dx: jnp.ndarray, x: st.State, x_prop: st.State) -> jnp.ndarray:
    """23x23 block-diagonal tangent-frame transport T(dx).

    SO3 blocks: A(dx_blk)^T (esekfom.hpp:1668); S2 block:
    Nx_yy(x.grav) @ Mx(x_prop.grav, dx_blk) (esekfom.hpp:1687-1691);
    identity elsewhere.  Both the per-iteration reprojection and the final
    covariance conjugation use this shape.
    """
    dtype = dx.dtype
    T = jnp.eye(st.DOF, dtype=dtype)
    for idx, _dim in st.SO3_BLOCKS:
        At = so3.A_matrix(dx[idx : idx + 3]).T
        T = T.at[idx : idx + 3, idx : idx + 3].set(At)
    for idx, _dim in st.S2_BLOCKS:
        Nx = s2.nx_yy(x.grav, st.S2_LENGTH)
        Mx = s2.mx(x_prop.grav, dx[idx : idx + 2], st.S2_LENGTH)
        T = T.at[idx : idx + 2, idx : idx + 2].set(Nx @ Mx)
    return T


def _sym(A: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (A + A.T)


def _spd_solve(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for SPD A via Cholesky.

    f32 safety: symmetrize and add a relative diagonal jitter so roundoff
    from the non-symmetric P update (the reference runs f64 and skips this,
    esekfom.hpp:1924) cannot push an eigenvalue negative.
    """
    n = A.shape[-1]
    A = _sym(A)
    eps = jnp.asarray(32.0, A.dtype) * jnp.finfo(A.dtype).eps
    jitter = eps * (jnp.trace(A) / n)
    A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


# --------------------------------------------------------------------------
# iterated update (modified dyn-share form)
# --------------------------------------------------------------------------


class UpdateResult(NamedTuple):
    x: st.State
    P: jnp.ndarray
    carry: Any  # final measurement carry (neighbor caches etc.)
    iterations: jnp.ndarray  # number of h_fn evaluations performed
    valid: jnp.ndarray  # whether any update was applied


def update_iterated(
    x: st.State,
    P: jnp.ndarray,
    h_fn: MeasFn,
    carry0: Any,
    R: float,
    max_iter: int,
    epsi: float = 0.001,
    axis_name: str = None,
) -> UpdateResult:
    """The modified iterated update (esekfom.hpp:1619-1931) as a while_loop.

    ``h_fn(x, converge, carry)`` plays ``h_dyn_share``: builds masked residual
    rows and Jacobians; ``converge`` gates re-association exactly like
    ``ekfom_data.converge`` gates the kNN re-search (laserMapping.cpp:667).

    R is the scalar measurement noise (LASER_POINT_COV, laserMapping.cpp:64).

    ``axis_name``: when running under shard_map with the measurement rows
    split across devices, the H^T H / H^T h partials and the validity count
    are psum-reduced over that mesh axis — the distributed Gauss-Newton
    reduction of SURVEY.md §2.8 (exact, because those are the only
    cross-point quantities the update consumes, esekfom.hpp:1784,1804).
    """
    with jax.default_matmul_precision("highest"):
        return _update_iterated_impl(
            x, P, h_fn, carry0, R, max_iter, epsi, axis_name
        )


def _update_iterated_impl(x, P, h_fn, carry0, R, max_iter, epsi, axis_name):
    dtype = P.dtype
    # epsi: scalar or per-component vector (the reference's epsi[23],
    # laserMapping.cpp:826-828); broadcast against dx_ either way
    epsi = jnp.asarray(epsi, dtype)
    x_prop = x
    P_prop = P
    n = st.DOF

    class Carry(NamedTuple):
        i: jnp.ndarray  # C++ loop variable, starts at -1
        t: jnp.ndarray  # converged-iteration count
        converge: jnp.ndarray  # bool flag fed to h_fn
        x: st.State
        h_carry: Any
        done: jnp.ndarray
        any_valid: jnp.ndarray
        P_post: jnp.ndarray  # R * P_inv of the accepted iteration (SPD)
        dx_final: jnp.ndarray  # (23,)
        n_evals: jnp.ndarray

    def cond(c: Carry):
        return jnp.logical_and(jnp.logical_not(c.done), c.i < max_iter)

    def body(c: Carry) -> Carry:
        out = h_fn(c.x, c.converge, c.h_carry)
        i_cpp = c.i  # value of the C++ iteration variable for this pass

        # --- everything below is skipped (via where) when !out.valid ---
        mrows = out.mask.astype(dtype)
        h_x = out.h_x * mrows[:, None]
        h = out.h * mrows

        dx = st.boxminus(c.x, x_prop)
        T = _block_transform(dx, c.x, x_prop)
        dx_new = T @ dx
        P_w = T @ P_prop @ T.T

        HTH = h_x.T @ h_x  # (12,12) — the only N-reductions
        HTh = h_x.T @ h  # (12,)
        if axis_name is not None:
            HTH = jax.lax.psum(HTH, axis_name)
            HTh = jax.lax.psum(HTh, axis_name)

        # info-form gain: P_temp = (P_w/R)^{-1} + blockdiag(HTH, 0)
        P_over_R_inv = _spd_solve(P_w / R, jnp.eye(n, dtype=dtype))
        P_temp = P_over_R_inv.at[:12, :12].add(HTH)
        P_inv = _spd_solve(P_temp, jnp.eye(n, dtype=dtype))
        K_h = P_inv[:, :12] @ HTh  # (23,)
        K_x12 = P_inv[:, :12] @ HTH  # (23, 12)

        dx_ = K_h + K_x12 @ dx_new[:12] - dx_new
        x_new = st.boxplus(c.x, dx_)

        converged = jnp.all(jnp.abs(dx_) <= epsi)
        t_new = c.t + converged.astype(jnp.int32)
        # force re-search on the second-to-last lap if never converged
        # (esekfom.hpp:1829-1832)
        force = jnp.logical_and(t_new == 0, i_cpp == max_iter - 2)
        converge_next = jnp.logical_or(converged, force)

        done_now = jnp.logical_or(t_new > 1, i_cpp == max_iter - 1)

        def sel(new, old):
            return jnp.where(out.valid, new, old)

        x_sel = jax.tree.map(
            lambda a, b: jnp.where(out.valid, a, b), x_new, c.x
        )
        return Carry(
            i=c.i + 1,
            t=sel(t_new, c.t),
            converge=sel(converge_next, c.converge),
            x=x_sel,
            h_carry=out.carry,
            done=jnp.logical_and(out.valid, done_now),
            any_valid=jnp.logical_or(c.any_valid, out.valid),
            P_post=sel(R * P_inv, c.P_post),
            dx_final=sel(dx_, c.dx_final),
            n_evals=c.n_evals + 1,
        )

    init = Carry(
        i=jnp.asarray(-1, jnp.int32),
        t=jnp.asarray(0, jnp.int32),
        converge=jnp.asarray(True),
        x=x,
        h_carry=carry0,
        done=jnp.asarray(False),
        any_valid=jnp.asarray(False),
        P_post=P_prop,
        dx_final=jnp.zeros(n, dtype=dtype),
        n_evals=jnp.asarray(0, jnp.int32),
    )
    final = jax.lax.while_loop(cond, body, init)

    # Final covariance update.  The reference computes
    # P = L - K_x[:, :12] P[:12, :] with per-block tangent transports applied
    # to L, K_x and P's columns (esekfom.hpp:1834-1925).  Algebraically
    # (I - K_x) P_w = R * ((P_w/R)^-1 + HtH)^-1 = R * P_inv, so the whole
    # update collapses to P = T (R P_inv) T^T — identical in exact
    # arithmetic, and SPD by construction, where the reference's open-form
    # subtraction loses definiteness in f32.
    def apply_final(_):
        T = _block_transform(final.dx_final, final.x, x_prop)
        return _sym(T @ final.P_post @ T.T)

    P_new = jax.lax.cond(
        final.any_valid, apply_final, lambda _: P_prop, operand=None
    )
    return UpdateResult(
        x=final.x,
        P=P_new,
        carry=final.h_carry,
        iterations=final.n_evals,
        valid=final.any_valid,
    )
