"""Incremental voxel-hash map — the TPU-native replacement for ikd-Tree.

The reference holds its map in an incremental k-d tree (submodule, API
reconstructed in SURVEY.md §2: ``Build``, ``Nearest_Search``, ``Add_Points``
with on-tree voxel downsampling, ``Delete_Point_Boxes``).  Pointer trees and
dynamic shapes don't map to TPU, so this module re-designs the map as a
fixed-capacity bucketed spatial hash held in device arrays:

* storage: ``pts (H, B, 3)`` + ``valid (H, B)`` — H hash buckets of B slots.
  A point lives in the bucket of its *storage cell* (side ``cell_size``,
  default 4x the map-downsample voxel: coarse cells keep the kNN gather down
  to 8 bucket rows while still covering the useful neighbor radius; the
  reference's acceptance gate is 5th NN <= sqrt(5) m, laserMapping.cpp:671).
* kNN     = gather the 2x2x2 cell region nearest the query (round-to-corner)
  + masked top-k (replaces ``Nearest_Search``).  Guaranteed coverage radius
  = cell_size/2 = 2 map voxels — identical to the previous 3x3x3-of-2-voxel
  layout, but with 8 gathered rows per query instead of 27 (XLA's gather
  cost is per row; measured 2.1x faster end to end).  Hash collisions are
  benign: a colliding candidate is a real map point whose true distance is
  computed anyway, and candidates from outside the region are masked.
* insert  = masked sort/rank/scatter with the reference's spatial hysteresis
  (``map_incremental``, laserMapping.cpp:427-474) and the ikd-Tree's
  keep-nearest-to-voxel-center downsample semantics.
* delete  = the sliding local-map cube becomes one masked AABB pass
  (replaces lazy ``Delete_Point_Boxes``).

Everything is a pure function of the Map pytree; under jit the buffers are
donated so updates are in-place in HBM.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

NUM_MATCH_POINTS = 5  # common_lib.h:26


class MapConfig(NamedTuple):
    h_log2: int = 14  # 16384 buckets
    bucket_slots: int = 64  # B; capacity = 2^h_log2 * B points
    cell_size: float = 2.0  # storage-cell side (m); MUST be an integer
    # multiple of voxel_size so every downsample voxel nests in exactly one
    # cell — otherwise the same-voxel dedup can miss incumbents stored in a
    # neighboring bucket.  Use make_config() to derive it.
    voxel_size: float = 0.5  # map downsample voxel (filter_size_map_min)

    @property
    def num_buckets(self):
        return 1 << self.h_log2

    @property
    def knn_candidates(self):
        """Candidate rows materialized per query by knn_search."""
        return 8 * self.bucket_slots


def make_config(voxel_size: float, h_log2: int = 14,
                bucket_slots: int = None) -> MapConfig:
    """Canonical config: storage cell = 4 x map voxel (nesting guaranteed,
    2x2x2-region kNN coverage radius = 2 voxels).  Default slot count covers
    a full cell's worth of downsample voxels (4^3)."""
    return MapConfig(
        h_log2=h_log2,
        bucket_slots=64 if bucket_slots is None else bucket_slots,
        cell_size=4.0 * voxel_size,
        voxel_size=voxel_size,
    )


class Map(NamedTuple):
    pts: jnp.ndarray  # (H, B, 3) f32
    valid: jnp.ndarray  # (H, B) bool
    dropped: jnp.ndarray  # () int32, points lost to bucket overflow


def make_map(cfg: MapConfig, dtype=jnp.float32) -> Map:
    H, B = cfg.num_buckets, cfg.bucket_slots
    return Map(
        pts=jnp.zeros((H, B, 3), dtype=dtype),
        valid=jnp.zeros((H, B), dtype=bool),
        dropped=jnp.zeros((), jnp.int32),
    )


def map_size(m: Map) -> jnp.ndarray:
    """Live point count (the ikd-Tree ``validnum`` analog)."""
    return jnp.sum(m.valid.astype(jnp.int32))


def flatten(m: Map):
    """All live map points as a host array (n, 3) — the ikd-Tree
    ``flatten``/PCL_Storage analog used for /Laser_map publishing and map
    export (laserMapping.cpp:944-947)."""
    import numpy as np

    pts = np.asarray(m.pts.reshape(-1, 3))
    valid = np.asarray(m.valid.reshape(-1))
    return pts[valid]


# --------------------------------------------------------------------------
# hashing
# --------------------------------------------------------------------------

_P1, _P2, _P3 = 73856093, 19349663, 83492791  # classic spatial-hash primes


def _cell_of(pts: jnp.ndarray, cell_size: float) -> jnp.ndarray:
    return jnp.floor(pts / cell_size).astype(jnp.int32)


def cell_hash(cell: jnp.ndarray) -> jnp.ndarray:
    """Raw 32-bit spatial hash of integer cell coords (…, 3) -> (…,).

    Prime-multiply XOR seed + murmur3-style avalanche so planar point
    distributions (every LiDAR scan) don't pile into a few buckets.  Low bits
    index the bucket; the multi-device layer (fast_lio_tpu.parallel) derives
    shard ownership from the high bits so each spatial cell lives on exactly
    one device."""
    h = (cell[..., 0] * _P1) ^ (cell[..., 1] * _P2) ^ (cell[..., 2] * _P3)
    h = h.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h.astype(jnp.int32)


def _bucket_of(cell: jnp.ndarray, h_log2: int) -> jnp.ndarray:
    return (cell_hash(cell) & ((1 << h_log2) - 1)).astype(jnp.int32)


# --------------------------------------------------------------------------
# kNN search
# --------------------------------------------------------------------------

_NEIGHBOR_OFFSETS = jnp.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=jnp.int32,
)  # (8, 3) — the 2x2x2 region above the round-to-corner base cell
_N_OFF = 8


def rescore_candidates(
    cand_pts: jnp.ndarray,  # (N, C, 3) cached gathered candidates
    cand_ok: jnp.ndarray,  # (N, C)
    queries: jnp.ndarray,  # (N, 3)
    k: int = NUM_MATCH_POINTS,
):
    """Re-rank cached candidates at new query positions (no map gather).

    Used by converged-iteration re-searches when Config.rescore_research is
    on: the pose moves millimeters between Gauss-Newton iterates, so the
    candidate REGION from the scan's first search still covers the true kNN.
    """
    d2 = jnp.sum((cand_pts - queries[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)
    neg_top, idx = jax.lax.top_k(-d2, k)
    sq = -neg_top
    nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
    return nbrs, sq, jnp.isfinite(sq)


def knn_search(
    m: Map, cfg: MapConfig, queries: jnp.ndarray, k: int = NUM_MATCH_POINTS,
    return_candidates: bool = False,
):
    """k nearest map points per query.

    queries: (N, 3).  Returns (neighbors (N, k, 3), sq_dists (N, k) — +inf for
    missing, found_mask (N, k)).  Replaces ikd-Tree ``Nearest_Search``
    (laserMapping.cpp:670) with an 8-cell (2x2x2) gather + top-k: exact
    within the covered neighborhood (>= cell_size/2 from the query in every
    axis), which covers the reference's acceptance gate (5th NN sq-dist <=
    5 m^2) for any practically dense map region.
    """
    B = cfg.bucket_slots
    # base = the corner cell of the 2x2x2 region nearest the query: every
    # point within cell_size/2 of the query falls inside the region
    base = jnp.floor(queries / cfg.cell_size - 0.5).astype(jnp.int32)  # (N,3)
    ncells = base[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]  # (N, 8, 3)
    buckets = _bucket_of(ncells, cfg.h_log2)  # (N, 8)

    # two neighbor cells may hash to the same bucket; gather each bucket once
    # or its slots would enter the candidate list (and the top-k) twice
    b_sorted = jnp.sort(buckets, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(b_sorted[:, :1], dtype=bool),
         b_sorted[:, 1:] == b_sorted[:, :-1]], axis=-1,
    )
    buckets = jnp.where(dup, cfg.num_buckets - 1, b_sorted)  # harmlessly re-
    # points dup slots at one bucket; their slots are masked below

    cand_pts = m.pts[buckets].reshape(queries.shape[0], _N_OFF * B, 3)
    cand_ok = m.valid[buckets].reshape(queries.shape[0], _N_OFF * B)
    cand_ok = jnp.logical_and(
        cand_ok, jnp.logical_not(jnp.repeat(dup, B, axis=-1))
    )

    # drop hash-collision candidates from cells outside the 2x2x2 block:
    # keeps the search semantics exactly "kNN within the covered region",
    # identical for any shard count (fast_lio_tpu.parallel merges per-shard
    # results)
    cand_cell = _cell_of(cand_pts, cfg.cell_size)
    rel = cand_cell - base[:, None, :]
    in_region = jnp.all(jnp.logical_and(rel >= 0, rel <= 1), axis=-1)
    cand_ok = jnp.logical_and(cand_ok, in_region)

    diff = cand_pts - queries[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)

    neg_top, idx = jax.lax.top_k(-d2, k)  # (N, k)
    sq = -neg_top
    nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
    found = jnp.isfinite(sq)
    if return_candidates:
        return nbrs, sq, found, cand_pts, jnp.isfinite(d2)
    return nbrs, sq, found


# --------------------------------------------------------------------------
# insertion with spatial hysteresis
# --------------------------------------------------------------------------


def _voxel_center(p: jnp.ndarray, voxel: float) -> jnp.ndarray:
    return jnp.floor(p / voxel) * voxel + 0.5 * voxel


def insert_decisions(
    pts_world: jnp.ndarray,  # (N, 3)
    mask: jnp.ndarray,  # (N,) live scan points
    nearest: jnp.ndarray,  # (N, k, 3) cached 5-NN from the update loop
    nearest_found: jnp.ndarray,  # (N, k)
    ekf_inited: jnp.ndarray,  # ()
    voxel: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The map_incremental policy (laserMapping.cpp:433-467).

    Returns (add_mask, downsample_flag):
      * no neighbors / not inited        -> add, with downsample
      * nearest NN outside the voxel on every axis -> add, NO downsample
      * any of the 5 NN nearer to the voxel center -> skip
      * otherwise                        -> add, with downsample
    """
    mid = _voxel_center(pts_world, voxel)
    dist = jnp.sum((pts_world - mid) ** 2, axis=-1)

    have_nbrs = jnp.logical_and(nearest_found[:, 0], ekf_inited)
    nn0 = nearest[:, 0, :]
    far_all_axes = jnp.all(jnp.abs(nn0 - mid) > 0.5 * voxel, axis=-1)

    # any of the k NN (only if all k found, reference :452-454) nearer to mid
    nbr_d = jnp.sum((nearest - mid[:, None, :]) ** 2, axis=-1)
    nbr_d = jnp.where(nearest_found, nbr_d, jnp.inf)
    all_found = jnp.all(nearest_found, axis=-1)
    blocked = jnp.logical_and(all_found, jnp.any(nbr_d < dist[:, None], axis=-1))

    add = jnp.where(
        have_nbrs,
        jnp.logical_or(far_all_axes, jnp.logical_not(blocked)),
        True,
    )
    downsample = jnp.where(have_nbrs, jnp.logical_not(far_all_axes), True)
    return jnp.logical_and(add, mask), downsample


def insert(
    m: Map,
    cfg: MapConfig,
    pts: jnp.ndarray,  # (N, 3) world-frame candidates
    add_mask: jnp.ndarray,  # (N,)
    downsample: jnp.ndarray,  # (N,) per-point flag
) -> Map:
    """Masked scatter insert (the ``Add_Points`` analog).

    Downsample-on points keep at most one point per 0.5 m voxel, preferring
    the one nearest the voxel center (ikd-Tree on-tree downsample semantics).
    Bucket-full points are dropped and counted (the tree would rebalance;
    the local-map prune keeps occupancy low instead).
    """
    N = pts.shape[0]
    H, B = cfg.num_buckets, cfg.bucket_slots
    dtype = m.pts.dtype
    FLAT = H * B

    vox = _cell_of(pts, cfg.voxel_size)  # (N,3) int voxel coords
    mid = _voxel_center(pts, cfg.voxel_size)
    d_mid = jnp.sum((pts - mid) ** 2, axis=-1)

    # ---- intra-batch dedup among downsample-on points -------------------
    # pack voxel coords relative to the batch min into a sortable key;
    # one scan spans << 2^10 voxels per axis, so 10 bits/axis is exact here.
    ref = jnp.min(jnp.where(add_mask[:, None], vox, 2**30), axis=0)
    rel = jnp.clip(vox - ref, 0, 1023)
    key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
    live_ds = jnp.logical_and(add_mask, downsample)
    # sort (key, d_mid): the first entry of each key-group is the winner
    big = jnp.int32(2**30)
    sort_key = jnp.where(live_ds, key, big)
    order = jnp.lexsort((d_mid, sort_key))
    sk = sort_key[order]
    is_first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    winner_sorted = jnp.logical_and(is_first, sk < big)
    winner = jnp.zeros(N, dtype=bool).at[order].set(winner_sorted)
    live = jnp.logical_or(winner, jnp.logical_and(add_mask, ~downsample))

    # ---- per-candidate bucket + slot inspection --------------------------
    cell = _cell_of(pts, cfg.cell_size)
    bucket = _bucket_of(cell, cfg.h_log2)  # (N,)
    slot_pts = m.pts[bucket]  # (N, B, 3)
    slot_ok = m.valid[bucket]  # (N, B)

    slot_vox = _cell_of(slot_pts, cfg.voxel_size)  # (N, B, 3)
    same_vox = jnp.logical_and(
        jnp.all(slot_vox == vox[:, None, :], axis=-1), slot_ok
    )  # (N, B)
    has_same = jnp.any(same_vox, axis=-1)
    same_slot = jnp.argmax(same_vox, axis=-1)  # first matching slot

    slot_mid_d = jnp.sum((slot_pts - mid[:, None, :]) ** 2, axis=-1)
    existing_d = jnp.take_along_axis(slot_mid_d, same_slot[:, None], axis=1)[:, 0]

    is_ds = jnp.logical_and(live, downsample)
    # replace iff new point is nearer the voxel center than the incumbent
    do_replace = jnp.logical_and(jnp.logical_and(is_ds, has_same), d_mid < existing_d)
    # append candidates: live points with no same-voxel incumbent (ds) or all
    # no-downsample points
    do_append = jnp.logical_and(live, jnp.logical_not(jnp.logical_and(is_ds, has_same)))

    # ---- append slot assignment (rank within bucket) ---------------------
    app_bucket = jnp.where(do_append, bucket, H)  # H = sentinel
    order2 = jnp.argsort(app_bucket)
    sb = app_bucket[order2]
    first2 = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first2, jnp.arange(N), 0)
    )
    rank_sorted = jnp.arange(N) - seg_start
    rank = jnp.zeros(N, jnp.int32).at[order2].set(rank_sorted.astype(jnp.int32))

    # free slots of each candidate's bucket, in ascending slot order
    free_order = jnp.argsort(slot_ok, axis=-1, stable=True)  # False first
    free_count = B - jnp.sum(slot_ok, axis=-1)
    app_ok = jnp.logical_and(do_append, rank < free_count)
    app_slot = jnp.take_along_axis(
        free_order, jnp.clip(rank, 0, B - 1)[:, None], axis=1
    )[:, 0]

    overflow = jnp.sum(jnp.logical_and(do_append, rank >= free_count))

    # ---- scatter ----------------------------------------------------------
    flat_replace = jnp.where(do_replace, bucket * B + same_slot, FLAT)
    flat_append = jnp.where(app_ok, bucket * B + app_slot, FLAT)

    pts_flat = m.pts.reshape(FLAT, 3)
    val_flat = m.valid.reshape(FLAT)
    pts_flat = pts_flat.at[flat_replace].set(pts.astype(dtype), mode="drop")
    pts_flat = pts_flat.at[flat_append].set(pts.astype(dtype), mode="drop")
    val_flat = val_flat.at[flat_append].set(True, mode="drop")

    return Map(
        pts=pts_flat.reshape(H, B, 3),
        valid=val_flat.reshape(H, B),
        dropped=m.dropped + overflow.astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# deletion (sliding local map)
# --------------------------------------------------------------------------


def prune_outside(m: Map, lo: jnp.ndarray, hi: jnp.ndarray) -> Map:
    """Invalidate every point outside the axis-aligned box [lo, hi].

    Replaces the vacated-slab ``Delete_Point_Boxes`` bookkeeping
    (laserMapping.cpp:254-275): pruning to the *new* cube is equivalent to
    deleting the vacated slabs and costs one masked elementwise pass.
    """
    inside = jnp.all(
        jnp.logical_and(m.pts >= lo, m.pts <= hi), axis=-1
    )
    return m._replace(valid=jnp.logical_and(m.valid, inside))
