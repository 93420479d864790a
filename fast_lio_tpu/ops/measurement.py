"""Point-to-plane measurement model — the ``h_share_model`` analog.

TPU-native re-design of /root/reference/src/laserMapping.cpp:638-754.  The
reference runs an OpenMP loop doing per-point kNN + plane fit + gating, then a
serial compaction building H (N x 12) and h.  Here the whole thing is one
batched kernel over a fixed-size padded point block:

* body->world transform: two batched matmuls (laserMapping.cpp:656-661)
* convergence-gated kNN re-search against the voxel-hash map with cached
  neighborhoods (laserMapping.cpp:667-672)
* batched plane fit + robust gate s = 1 - 0.9 |pd2| / sqrt(|p|) > 0.9
  (laserMapping.cpp:678-691)
* no compaction: ``point_selected_surf`` becomes a row mask; H^T H and H^T h
  are the only consumers downstream so masked rows simply contribute zero
  (SURVEY.md §7.1.2).

H row layout (laserMapping.cpp:737-748):
    [ n^T,  (hat(R_ext p + t_ext) R^T n)^T,  (hat(p) R_ext^T R^T n)^T,
      (R^T n)^T ]
with the extrinsic columns zeroed when extrinsic estimation is off.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import state as st
from ..map import hash_map as hm
from ..math import so3
from .plane_fit import fit_plane

NUM_MATCH = hm.NUM_MATCH_POINTS
MAX_NN_SQ_DIST = 5.0  # 5th-NN gate, m^2 (laserMapping.cpp:671)
PLANE_THRESHOLD = 0.1  # plane residual gate, m (laserMapping.cpp:678)
ROBUST_S_GATE = 0.9  # acceptance on s (laserMapping.cpp:683)


class NeighborCache(NamedTuple):
    """Per-point association state persisted across filter iterations
    (the reference's Nearest_Points / point_selected_surf,
    laserMapping.cpp:101,94).  The fitted planes are cached too: a plane
    depends only on the map neighbors, so refitting on non-research
    iterations (as the reference's per-point CPU loop does) is redundant —
    identical results, one batched fit per search instead of per iteration.

    (Candidate rescoring — Config.rescore_research — no longer stores its
    block here: pipeline.lio_step hoists the one full search ahead of the
    GN loop and closes knn_fn over the candidate block, so the loop carry
    stays small and no per-iteration cond select copies it.)
    """

    nbrs: jnp.ndarray  # (N, K, 3)
    found: jnp.ndarray  # (N, K)
    selected: jnp.ndarray  # (N,)
    pabcd: jnp.ndarray  # (N, 4) cached plane fits
    plane_ok: jnp.ndarray  # (N,)


def empty_cache(n: int, dtype=jnp.float32) -> NeighborCache:
    return NeighborCache(
        nbrs=jnp.zeros((n, NUM_MATCH, 3), dtype=dtype),
        found=jnp.zeros((n, NUM_MATCH), dtype=bool),
        selected=jnp.zeros(n, dtype=bool),
        pabcd=jnp.zeros((n, 4), dtype=dtype),
        plane_ok=jnp.zeros(n, dtype=bool),
    )


def body_to_world(x: st.State, pts_body: jnp.ndarray) -> jnp.ndarray:
    """p_w = R (R_ext p + t_ext) + pos, batched.

    Quaternion rotation (elementwise VPU ops) instead of a matmul: TPU dots
    default to bf16 inputs, which costs centimeters on meter-scale points."""
    p_imu = so3.quat_rotate(x.offset_R_L_I, pts_body) + x.offset_T_L_I
    return so3.quat_rotate(x.rot, p_imu) + x.pos


def compute_measurement(
    x: st.State,
    pts_body: jnp.ndarray,  # (N, 3) deskewed, LiDAR frame
    mask: jnp.ndarray,  # (N,) live points
    knn_fn,  # (queries (N,3), mask (N,)) -> (nbrs (N,K,3), sq (N,K), found)
    cache: NeighborCache,
    converge: jnp.ndarray,  # () bool — re-search gate
    extrinsic_est: bool = True,
    row_mask: jnp.ndarray = None,  # optional extra mask on H rows (sharding)
):
    """One h_share_model evaluation.  Returns (h_x, h, sel, cache', p_world).

    h_x: (N, 12), h: (N,) with h = -pd2; sel is the effective-point mask.
    ``knn_fn`` abstracts the map search (build with pipeline.make_knn_fn) so
    the multi-device layer can inject a shard-merged search and the rescore
    mode a cached-candidate re-rank; it receives the live-point mask so
    adaptive modes (wide fallback) ignore padded rows.
    """
    dtype = pts_body.dtype
    p_world = body_to_world(x, pts_body)

    def select_and_fit(nbrs, sq, found):
        all_found = jnp.all(found, axis=-1)
        close = sq[:, NUM_MATCH - 1] <= MAX_NN_SQ_DIST
        selected = jnp.logical_and(jnp.logical_and(all_found, close), mask)
        pabcd, plane_ok = fit_plane(nbrs, found, PLANE_THRESHOLD)
        return nbrs.astype(dtype), found, selected, pabcd.astype(dtype), plane_ok

    def research(_):
        nbrs, sq, found = knn_fn(p_world, mask)
        return NeighborCache(*select_and_fit(nbrs, sq, found))

    cache = jax.lax.cond(converge, research, lambda _: cache, operand=None)

    pabcd, plane_ok = cache.pabcd, cache.plane_ok
    pd2 = jnp.sum(pabcd[:, :3] * p_world, axis=-1) + pabcd[:, 3]
    body_norm = jnp.linalg.norm(pts_body, axis=-1)
    s = 1.0 - 0.9 * jnp.abs(pd2) / jnp.sqrt(jnp.maximum(body_norm, 1e-9))
    gate = jnp.logical_and(plane_ok, s > ROBUST_S_GATE)
    sel = jnp.logical_and(cache.selected, gate)

    # H rows (laserMapping.cpp:723-752); all rotations via quats (see
    # body_to_world for why)
    norm_vec = pabcd[:, :3]
    C = so3.quat_rotate(so3.quat_conjugate(x.rot), norm_vec)  # R^T n
    p_imu = so3.quat_rotate(x.offset_R_L_I, pts_body) + x.offset_T_L_I
    A = jnp.cross(p_imu, C)  # hat(p_imu) @ C
    if extrinsic_est:
        # hat(p_be) @ (R_ext^T C)
        B = jnp.cross(
            pts_body, so3.quat_rotate(so3.quat_conjugate(x.offset_R_L_I), C)
        )
    else:
        B = jnp.zeros_like(A)
    h_x = jnp.concatenate([norm_vec, A, B, C], axis=-1)  # (N, 12)
    h = -pd2

    rows = sel if row_mask is None else jnp.logical_and(sel, row_mask)
    selc = rows[:, None].astype(dtype)
    h_x = h_x * selc
    h = h * rows.astype(dtype)

    new_cache = cache._replace(selected=sel)
    valid = jnp.sum(sel) > 0
    return h_x, h, rows, new_cache, valid, p_world
