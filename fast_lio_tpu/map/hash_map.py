"""Incremental voxel-hash map — the TPU-native replacement for ikd-Tree.

The reference holds its map in an incremental k-d tree (submodule, API
reconstructed in SURVEY.md §2: ``Build``, ``Nearest_Search``, ``Add_Points``
with on-tree voxel downsampling, ``Delete_Point_Boxes``).  Pointer trees and
dynamic shapes don't map to TPU, so this module re-designs the map as a
fixed-capacity bucketed spatial hash held in device arrays:

* storage: ``packed (H, 4B)`` — H hash buckets of B slots in PLANAR row
  layout ``[x(B) | y(B) | z(B) | w(B)]``.  The w channel encodes validity as
  a distance penalty (0.0 = live, 1e18 = free slot), so a candidate's
  masked squared distance is simply ``dx^2+dy^2+dz^2+w``.  One bucket is ONE
  1 KB row: a single XLA gather row, a single DMA descriptor for the demoted
  Pallas kNN kernels (tools/knn_pallas.py), and lane-aligned channel slices (B=64 ->
  4x64=256 lanes).  A point lives in the bucket of its *storage cell* (side
  ``cell_size``, default 4x the map-downsample voxel).
* kNN     = gather the 2x2x2 cell region nearest the query (round-to-corner)
  + masked top-k (replaces ``Nearest_Search``).  Guaranteed coverage radius
  = cell_size/2 = 2 map voxels.  Hash collisions are filtered exactly by an
  axis-aligned bounds check against the region box (a colliding candidate
  from a far cell fails the bounds test).  The optional wide mode (3x3x3
  centered region, coverage radius = cell_size) closes the sparse-regime
  gap toward the reference's sqrt(5) m acceptance gate
  (laserMapping.cpp:671); see ``knn_search(..., wide=True)``.
* insert  = masked scatter with the reference's spatial hysteresis
  (``map_incremental``, laserMapping.cpp:427-474) and the ikd-Tree's
  keep-nearest-to-voxel-center downsample semantics.
* delete  = the sliding local-map cube becomes one masked w-channel pass
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

W_FREE = 1.0e18  # w-channel value of a free slot; d2 >= 1e18 => not a point
W_VALID_MAX = 1.0e17  # found threshold on returned squared distances
_OOB = 1.0e18  # distance penalty for candidates outside the search region
_D2_BARRIER = False  # experiment hook: materialize d2 before the k-sweeps


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
    def row_width(self):
        return 4 * self.bucket_slots

    @property
    def knn_candidates(self):
        """Candidate rows materialized per query by knn_search."""
        return 8 * self.bucket_slots


def make_config(voxel_size: float, h_log2: int = 14,
                bucket_slots: int = None,
                cell_multiplier: int = 4) -> MapConfig:
    """Canonical config: storage cell = cell_multiplier x map voxel (nesting
    guaranteed; 2x2x2-region kNN coverage radius = cell_multiplier/2 voxels).
    Default slot count covers a full cell's worth of downsample voxels —
    cell_multiplier^3 rounded up to a multiple of 64 (the lane width), so a
    fully downsample-populated cell never overflows its bucket.  At the
    default multiplier 4 that is 64 slots; the sparse preset's multiplier 5
    (125 voxels/cell) gets 128 — without this, dense near-field cells
    systematically drop points (round-3 outdoor e2e diagnosis)."""
    if bucket_slots is None:
        bucket_slots = max(64, -(-cell_multiplier**3 // 64) * 64)
    return MapConfig(
        h_log2=h_log2,
        bucket_slots=bucket_slots,
        cell_size=float(cell_multiplier) * voxel_size,
        voxel_size=voxel_size,
    )


class Map(NamedTuple):
    packed: jnp.ndarray  # (H, 4B) f32 planar rows [x|y|z|w]
    dropped: jnp.ndarray  # () int32, points lost to bucket overflow


def make_map(cfg: MapConfig, dtype=jnp.float32) -> Map:
    H, B = cfg.num_buckets, cfg.bucket_slots
    packed = jnp.concatenate(
        [jnp.zeros((H, 3 * B), dtype=dtype),
         jnp.full((H, B), W_FREE, dtype=dtype)], axis=-1,
    )
    return Map(packed=packed, dropped=jnp.zeros((), jnp.int32))


def channels(m: Map, cfg: MapConfig):
    """(x, y, z, w) channel views of the packed rows, each (H, B)."""
    B = cfg.bucket_slots
    p = m.packed
    return p[:, :B], p[:, B:2 * B], p[:, 2 * B:3 * B], p[:, 3 * B:]


def valid_mask(m: Map, cfg: MapConfig) -> jnp.ndarray:
    """(H, B) live-slot mask."""
    B = cfg.bucket_slots
    return m.packed[:, 3 * B:] == 0.0


def map_size(m: Map, cfg: MapConfig = None) -> jnp.ndarray:
    """Live point count (the ikd-Tree ``validnum`` analog)."""
    B = m.packed.shape[-1] // 4
    return jnp.sum((m.packed[:, 3 * B:] == 0.0).astype(jnp.int32))


def points(m: Map, cfg: MapConfig) -> jnp.ndarray:
    """(H, B, 3) point coordinates (device view; mostly for tests)."""
    x, y, z, _ = channels(m, cfg)
    return jnp.stack([x, y, z], axis=-1)


def flatten(m: Map, cfg: MapConfig = None):
    """All live map points as a host array (n, 3) — the ikd-Tree
    ``flatten``/PCL_Storage analog used for /Laser_map publishing and map
    export (laserMapping.cpp:944-947)."""
    import numpy as np

    p = np.asarray(m.packed)
    B = p.shape[-1] // 4
    pts = np.stack([p[:, :B], p[:, B:2 * B], p[:, 2 * B:3 * B]], axis=-1)
    ok = p[:, 3 * B:] == 0.0
    return pts.reshape(-1, 3)[ok.reshape(-1)]


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

# numpy (not jnp) so importing this module never initializes the XLA backend
# — jax.distributed.initialize must run before ANY backend touch, and the
# multi-process bring-up imports the package first (tests/test_distributed.py)
import numpy as _np

_NEIGHBOR_OFFSETS = _np.array(
    [[dx, dy, dz] for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
    dtype=_np.int32,
)  # (8, 3) — the 2x2x2 region above the round-to-corner base cell

_WIDE_OFFSETS = _np.array(
    [[dx, dy, dz] for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)],
    dtype=_np.int32,
)  # (27, 3) — centered 3x3x3 region (wide / sparse-regime mode)


def region_cells(queries: jnp.ndarray, cfg: MapConfig, wide: bool = False):
    """Search-region cells per query: (base (N,3), cells (N,R,3), n_cells).

    Standard: round-to-corner 2x2x2 (coverage radius cell_size/2).
    Wide: centered 3x3x3 (coverage radius cell_size)."""
    if wide:
        base = jnp.floor(queries / cfg.cell_size - 1.0).astype(jnp.int32)
        cells = base[:, None, :] + (_WIDE_OFFSETS[None, :, :] + 1)
        return base, cells, 27
    base = jnp.floor(queries / cfg.cell_size - 0.5).astype(jnp.int32)
    cells = base[:, None, :] + _NEIGHBOR_OFFSETS[None, :, :]
    return base, cells, 8


def dedup_buckets(buckets: jnp.ndarray, sentinel: int):
    """Sort each query's bucket list and point duplicates (two region cells
    hashing to the same bucket) at ``sentinel`` so no slot enters the
    candidate list twice.  Returns (buckets', dup_mask), both sorted order."""
    b_sorted = jnp.sort(buckets, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(b_sorted[:, :1], dtype=bool),
         b_sorted[:, 1:] == b_sorted[:, :-1]], axis=-1,
    )
    return jnp.where(dup, sentinel, b_sorted), dup


def smallest_k(d2: jnp.ndarray, k: int):
    """Exact k-smallest along the last axis: (vals (..., k) ascending,
    idx (..., k) int32).  Ties break to the lowest index (lax.top_k's
    convention, so this is a drop-in replacement).

    k unrolled min/argmin sweeps instead of lax.top_k: top_k lowers to a
    partial sort that cannot fuse with the distance computation, measured
    1.38 ms at the search shapes (4096 x 512, k=5) on TPU v5e — the k-sweep
    version fuses into the d2 producer and is below measurement noise
    (< 0.05 ms).  k is small and static (NUM_MATCH_POINTS=5), so the unroll
    is exactly k fused reduce passes."""
    iota = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    inf = jnp.asarray(jnp.inf, d2.dtype)
    vals, idxs = [], []
    d = d2
    for _ in range(k):
        v = jnp.min(d, axis=-1)
        i = jnp.argmin(d, axis=-1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        d = jnp.where(iota == i[..., None], inf, d)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


def region_bounds(base: jnp.ndarray, cfg: MapConfig, n_side: int):
    """Half-open AABB [lo, hi) of an n_side^3 cell region starting at base."""
    lo = base.astype(jnp.float32) * cfg.cell_size
    hi = lo + n_side * cfg.cell_size
    return lo, hi


def knn_search(
    m: Map, cfg: MapConfig, queries: jnp.ndarray, k: int = NUM_MATCH_POINTS,
    return_candidates: bool = False, wide: bool = False,
):
    """k nearest map points per query (XLA path).

    queries: (N, 3).  Returns (neighbors (N, k, 3), sq_dists (N, k) — +inf for
    missing, found_mask (N, k)).  Replaces ikd-Tree ``Nearest_Search``
    (laserMapping.cpp:670) with a region gather + top-k: exact within the
    covered neighborhood (>= cell_size/2 from the query in every axis
    standard, >= cell_size wide).  Hash collisions are filtered exactly by
    the region bounds check.  (Two Pallas kernels with identical semantics
    live demoted in tools/ — both measured slower on chip, PERF.md.)"""
    B = cfg.bucket_slots
    N = queries.shape[0]
    base, cells, R = region_cells(queries, cfg, wide)
    # sentinel = a real bucket (cheapest gather target); its candidate slots
    # are killed outright by dup_mask below
    buckets, dup_mask = dedup_buckets(
        _bucket_of(cells, cfg.h_log2), cfg.num_buckets - 1
    )

    rows = m.packed[buckets.reshape(-1)].reshape(N, R, 4 * B)
    cx = rows[:, :, 0 * B:1 * B].reshape(N, R * B)
    cy = rows[:, :, 1 * B:2 * B].reshape(N, R * B)
    cz = rows[:, :, 2 * B:3 * B].reshape(N, R * B)
    cw = rows[:, :, 3 * B:4 * B].reshape(N, R * B)

    d2 = ((cx - queries[:, None, 0]) ** 2 + (cy - queries[:, None, 1]) ** 2
          + (cz - queries[:, None, 2]) ** 2 + cw)
    lo, hi = region_bounds(base, cfg, 3 if wide else 2)
    oob = ((cx < lo[:, None, 0]) | (cx >= hi[:, None, 0])
           | (cy < lo[:, None, 1]) | (cy >= hi[:, None, 1])
           | (cz < lo[:, None, 2]) | (cz >= hi[:, None, 2]))
    kill = oob | jnp.repeat(dup_mask, B, axis=-1)
    d2 = jnp.where(kill, _OOB, d2)

    if _D2_BARRIER:
        # pin d2 so the k min-sweeps re-read one materialized (N, C) f32
        # block instead of re-fusing into the full channel gather per sweep
        # (A/B experiment hook; see PERF.md)
        d2 = jax.lax.optimization_barrier(d2)
    sq, idx = smallest_k(d2, k)  # (N, k)
    found = sq < W_VALID_MAX
    if R * B <= 1024:
        # winner-coordinate extraction as a one-hot matmul: on TPU this
        # rides the MXU and is ~2.3x cheaper than per-row take_along_axis
        # gathers at the standard 2x2x2 shapes (C = 512,
        # tools/microbench_knn.py).  'highest' so f32 coordinates are never
        # rounded through bf16 operands; the one-hot factor is exact.
        oh = (idx[:, :, None] == jnp.arange(R * B)[None, None, :]
              ).astype(cx.dtype)
        cand = jnp.stack([cx, cy, cz], axis=-1)  # (N, R*B, 3)
        nbrs = jnp.einsum("nkc,ncd->nkd", oh, cand, precision="highest")
    else:
        # wide 3x3x3 at large buckets (e.g. 27 x 128 = 3456 candidates):
        # the (N, k, C) one-hot materializes hundreds of MB and made the
        # wide search 11.5 ms at ouster shapes (r4 profile); the k-index
        # channel gather scales with k, not C.
        nbrs = jnp.stack([
            jnp.take_along_axis(cx, idx, axis=1),
            jnp.take_along_axis(cy, idx, axis=1),
            jnp.take_along_axis(cz, idx, axis=1),
        ], axis=-1)
    sq = jnp.where(found, sq, jnp.inf)
    if return_candidates:
        cand_pts = jnp.stack([cx, cy, cz], axis=-1)
        return nbrs, sq, found, cand_pts, ~kill & (cw == 0.0)
    return nbrs, sq, found


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
    sq, idx = smallest_k(d2, k)
    nbrs = jnp.take_along_axis(cand_pts, idx[..., None], axis=1)
    return nbrs, sq, jnp.isfinite(sq)


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
    the local-map prune keeps occupancy low instead)."""
    N = pts.shape[0]
    H, B = cfg.num_buckets, cfg.bucket_slots
    W = 4 * B
    dtype = m.packed.dtype
    FLAT = H * W

    vox = _cell_of(pts, cfg.voxel_size)  # (N,3) int voxel coords
    mid = _voxel_center(pts, cfg.voxel_size)
    d_mid = jnp.sum((pts - mid) ** 2, axis=-1)

    # ---- voxel key + bucket -------------------------------------------
    # voxel coords relative to the MASKED batch min (points are world-frame,
    # so a static origin cannot bound them over a long run).  Key layout
    # (r5 — fixes the r4 10-bit clip, which aliased dedup keys once a scan
    # spanned >1023 voxels per axis; at det_range=450 m and 0.5 m map voxels
    # a single scan legally spans ~1800): TWO int32 sort keys carrying
    # 15 bits per axis, with the bucket folded into the high key so the
    # lexsort stays at 3 passes:
    #     key_hi = (bucket | dead->H) << 15 | rel_x      (needs h_log2 <= 15)
    #     key_lo = rel_y << 15 | rel_z
    # In-mask span bound is now 32766 voxels per axis (16.3 km at 0.5 m) —
    # far beyond any det_range.  Non-dedup points take the reserved guard
    # value 32767 per axis (rel clips to 32766), so they sort after their
    # bucket's dedup run and can never collide with a real voxel key.
    assert cfg.h_log2 <= 15, "insert key layout requires h_log2 <= 15"
    live_ds = jnp.logical_and(add_mask, downsample)
    ref = jnp.min(jnp.where(add_mask[:, None], vox, 2**30), axis=0)
    rel = jnp.clip(vox - ref, 0, 32766)
    GUARD = jnp.int32(32767)
    cell = _cell_of(pts, cfg.cell_size)
    bucket = _bucket_of(cell, cfg.h_log2)  # (N,)

    # ---- ONE sort serves both passes (r4: was two argsorts) -----------
    # order by (bucket[dead->H], voxel key, d_mid): voxel runs are contiguous
    # (a voxel nests in one cell => one bucket), so the dedup winner is the
    # first entry of each key run, AND bucket runs are contiguous, so append
    # ranks fall out of a segmented cumsum over the same order.
    bucket_key = jnp.where(add_mask, bucket, jnp.int32(H))
    key_hi = (bucket_key << 15) | jnp.where(live_ds, rel[:, 0], GUARD)
    key_lo = jnp.where(live_ds, (rel[:, 1] << 15) | rel[:, 2],
                       (GUARD << 15) | GUARD)
    # d_mid is NOT a sort key (r5): the bitonic comparator pays per operand
    # key, and the per-voxel nearest-to-center winner falls out of a
    # segmented min over the sorted order instead — two int32 keys, same
    # winner (ties at equal d_mid break to the sort-stable lowest original
    # index, exactly what the 3-key sort produced).
    order = jnp.lexsort((key_lo, key_hi))
    shi, slo = key_hi[order], key_lo[order]
    is_first = jnp.concatenate(
        [jnp.array([True]),
         jnp.logical_or(shi[1:] != shi[:-1], slo[1:] != slo[:-1])])
    dmid_s = d_mid[order]
    vox_seg = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # (N,) 0-based
    seg_min = jax.ops.segment_min(dmid_s, vox_seg, num_segments=N,
                                  indices_are_sorted=True)
    elig = dmid_s == seg_min[vox_seg]
    ex_elig = jnp.cumsum(elig.astype(jnp.int32)) - elig
    elig_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, ex_elig, 0))
    first_elig = jnp.logical_and(elig, ex_elig == elig_base)
    winner_sorted = jnp.logical_and(first_elig, live_ds[order])
    winner = jnp.zeros(N, dtype=bool).at[order].set(winner_sorted)
    live = jnp.logical_or(winner, jnp.logical_and(add_mask, ~downsample))

    # ---- per-candidate bucket + slot inspection --------------------------
    rows = m.packed[bucket]  # (N, W)
    sx, sy, sz = rows[:, :B], rows[:, B:2 * B], rows[:, 2 * B:3 * B]
    slot_ok = rows[:, 3 * B:] == 0.0  # (N, B)

    same_vox = (
        (jnp.floor(sx / cfg.voxel_size).astype(jnp.int32) == vox[:, None, 0])
        & (jnp.floor(sy / cfg.voxel_size).astype(jnp.int32) == vox[:, None, 1])
        & (jnp.floor(sz / cfg.voxel_size).astype(jnp.int32) == vox[:, None, 2])
        & slot_ok
    )  # (N, B)
    has_same = jnp.any(same_vox, axis=-1)
    same_slot = jnp.argmax(same_vox, axis=-1)  # first matching slot

    slot_mid_d = ((sx - mid[:, None, 0]) ** 2 + (sy - mid[:, None, 1]) ** 2
                  + (sz - mid[:, None, 2]) ** 2)
    existing_d = jnp.take_along_axis(slot_mid_d, same_slot[:, None], axis=1)[:, 0]

    is_ds = jnp.logical_and(live, downsample)
    # replace iff new point is nearer the voxel center than the incumbent
    do_replace = jnp.logical_and(jnp.logical_and(is_ds, has_same), d_mid < existing_d)
    # append candidates: live points with no same-voxel incumbent (ds) or all
    # no-downsample points
    do_append = jnp.logical_and(live, jnp.logical_not(jnp.logical_and(is_ds, has_same)))

    # ---- append slot assignment: rank among appenders within the bucket,
    # computed in the SAME sorted order (segmented exclusive cumsum).  Which
    # appender gets which free slot is arbitrary — it only picks overflow
    # victims when a bucket fills, and those are counted, not silent.
    sb = shi >> 15  # bucket_key recovered from the sorted high key
    first_b = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    flag = do_append[order].astype(jnp.int32)
    ex_cumsum = jnp.cumsum(flag) - flag  # exclusive
    seg_base = jax.lax.associative_scan(
        jnp.maximum, jnp.where(first_b, ex_cumsum, 0)
    )
    rank_sorted = ex_cumsum - seg_base
    rank = jnp.zeros(N, jnp.int32).at[order].set(rank_sorted.astype(jnp.int32))

    # rank-th free slot of each candidate's bucket WITHOUT a sort (r4: was a
    # stable per-row argsort): the rank-th free slot is the first position
    # where the inclusive free-count cumsum reaches rank+1 — one cumsum +
    # compare + argmax, all VPU-cheap at (N, B)
    free = jnp.logical_not(slot_ok)  # slot_ok == occupied (w == 0 is live)
    free_cum = jnp.cumsum(free.astype(jnp.int32), axis=-1)  # (N, B)
    free_count = free_cum[:, -1]
    app_ok = jnp.logical_and(do_append, rank < free_count)
    app_slot = jnp.argmax(
        jnp.logical_and(free, free_cum == (rank + 1)[:, None]), axis=-1
    ).astype(jnp.int32)

    overflow = jnp.sum(jnp.logical_and(do_append, rank >= free_count))

    # ---- scatter ----------------------------------------------------------
    # replace and append are disjoint per point (do_append excludes the
    # has-incumbent ds case), so each candidate writes at most one slot:
    # one flat scatter of 4 channel lanes per point (x, y, z, w=0)
    write_on = jnp.logical_or(do_replace, app_ok)
    write_slot = jnp.where(do_replace, same_slot, app_slot)
    base = jnp.where(write_on, bucket * W + write_slot, FLAT)  # FLAT = dropped
    idx = jnp.stack([base, base + B, base + 2 * B, base + 3 * B], -1)  # (N, 4)
    zeros = jnp.zeros((N, 1), dtype)
    vals = jnp.concatenate([pts.astype(dtype), zeros], axis=-1)  # (N, 4)

    packed = m.packed.reshape(FLAT)
    packed = packed.at[idx.reshape(-1)].set(vals.reshape(-1), mode="drop")

    return Map(
        packed=packed.reshape(H, W),
        dropped=m.dropped + overflow.astype(jnp.int32),
    )


# --------------------------------------------------------------------------
# deletion (sliding local map)
# --------------------------------------------------------------------------


def prune_outside(m: Map, lo: jnp.ndarray, hi: jnp.ndarray) -> Map:
    """Invalidate every point outside the axis-aligned box [lo, hi].

    Replaces the vacated-slab ``Delete_Point_Boxes`` bookkeeping
    (laserMapping.cpp:254-275): pruning to the *new* cube is equivalent to
    deleting the vacated slabs and costs one masked w-channel pass.
    """
    B = m.packed.shape[-1] // 4
    x, y, z = m.packed[:, :B], m.packed[:, B:2 * B], m.packed[:, 2 * B:3 * B]
    w = m.packed[:, 3 * B:]
    inside = ((x >= lo[0]) & (x <= hi[0]) & (y >= lo[1]) & (y <= hi[1])
              & (z >= lo[2]) & (z <= hi[2]))
    new_w = jnp.where(inside, w, jnp.asarray(W_FREE, m.packed.dtype))
    return m._replace(packed=m.packed.at[:, 3 * B:].set(new_w))
