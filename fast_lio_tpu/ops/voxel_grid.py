"""Device voxel-grid downsample (centroid per voxel).

TPU-native equivalent of the PCL ``VoxelGrid`` input filter the reference
applies to each deskewed scan (laserMapping.cpp:117,813,904-905): every
occupied voxel of side ``leaf`` is replaced by the centroid of its points.

Re-designed for fixed shapes: lexsort points by integer voxel coords, mark
segment heads, segment-sum positions/counts, emit a padded (n_out, 3) block
with a validity mask.  No dynamic shapes, no host roundtrip — it runs inside
the per-scan jitted step between deskew and the iEKF update.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def voxel_downsample(
    pts: jnp.ndarray,  # (N, 3)
    mask: jnp.ndarray,  # (N,) bool
    leaf: float,
    n_out: int,
    feats: jnp.ndarray = None,  # optional (N,) extra channel (intensity)
    coord_bound: float = None,  # static |coordinate| bound enabling key fusion
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (centroids (n_out, 3), out_mask (n_out,)[, feats (n_out,)]).

    Voxels beyond n_out are dropped (count them upstream if needed); masked
    inputs never contribute.  ``feats`` is voxel-averaged alongside the
    positions — PCL VoxelGrid's downsample_all_data behavior, which the
    reference relies on to carry intensity through its input filter.

    ``coord_bound``: when the caller can statically bound |coords| (scan
    points are body-frame, so det_range + deskew margin works), the 3-key
    lexsort collapses to a single fused int32 key — a ~3x narrower sort
    comparator on TPU.  The key uses a STATIC origin (``half`` voxels), so
    the result is exact iff every unmasked point satisfies |coord| <=
    coord_bound; a point beyond the bound is clamped per-point to the
    boundary voxel on the offending axis, affecting only itself (it may
    merge with a genuine boundary voxel) — in-bound points are never
    perturbed.  (A data-dependent origin such as the batch min would let a
    single far outlier shift every in-bound point's key — do not reintroduce
    it.)  Falls back to the exact lexsort when the fused key does not fit
    31 bits.
    """
    N = pts.shape[0]
    cell = jnp.floor(pts / leaf).astype(jnp.int32)
    BIG = jnp.int32(2**30)

    bits = 0
    if coord_bound is not None:
        import math

        # static per-axis shift: in-bound cells lie in [-(half-1), half-1]
        half = math.ceil(coord_bound / leaf) + 1
        bits = max(1, math.ceil(math.log2(2 * half)))
    if coord_bound is not None and 3 * bits <= 30:
        # ---- fused single-key path (static origin, per-point clamp) ----
        rel = jnp.clip(cell + half, 0, (1 << bits) - 1)
        key = (rel[:, 0] << (2 * bits)) | (rel[:, 1] << bits) | rel[:, 2]
        key = jnp.where(mask, key, BIG)
        order = jnp.argsort(key)
        sk = key[order]
        is_first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]])
    elif coord_bound is not None and bits <= 15:
        # ---- two-key path (r5): det_range-450-class bounds (e.g. 12 bits
        # per axis = 36 total) exceed one int32 but fit (x,y | z) in two —
        # a narrower sort comparator than the 3-key exact fallback.  Same
        # static origin + per-point clamp exactness argument as the 1-key
        # path; bits <= 15 keeps key_hi at 2*bits <= 30 (+1 guard for BIG).
        rel = jnp.clip(cell + half, 0, (1 << bits) - 1)
        key_hi = (rel[:, 0] << bits) | rel[:, 1]
        key_lo = rel[:, 2]
        key_hi = jnp.where(mask, key_hi, BIG)
        key_lo = jnp.where(mask, key_lo, BIG)
        order = jnp.lexsort((key_lo, key_hi))
        shi, slo = key_hi[order], key_lo[order]
        is_first = jnp.concatenate(
            [jnp.array([True]),
             (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    else:
        cx = jnp.where(mask, cell[:, 0], BIG)
        cy = jnp.where(mask, cell[:, 1], BIG)
        cz = jnp.where(mask, cell[:, 2], BIG)
        order = jnp.lexsort((cz, cy, cx))
        sx, sy, sz = cx[order], cy[order], cz[order]
        is_first = jnp.concatenate(
            [
                jnp.array([True]),
                (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1]) | (sz[1:] != sz[:-1]),
            ]
        )
    pts_s = pts[order]
    live_s = mask[order]
    is_first = jnp.logical_and(is_first, live_s)
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # (N,) 0-based
    # dead points -> overflow segment
    seg_id = jnp.where(live_s, jnp.minimum(seg_id, n_out), n_out)

    w = live_s.astype(pts.dtype)
    cols = pts_s if feats is None else jnp.concatenate(
        [pts_s, feats[order][:, None]], axis=-1
    )
    # seg_id is monotone non-decreasing by construction (cumsum over the
    # sorted order; dead points carry the max id) -> sorted-scatter path
    sums = jax.ops.segment_sum(
        cols * w[:, None], seg_id, num_segments=n_out + 1, indices_are_sorted=True
    )
    cnts = jax.ops.segment_sum(
        w, seg_id, num_segments=n_out + 1, indices_are_sorted=True
    )
    sums, cnts = sums[:n_out], cnts[:n_out]

    out_mask = cnts > 0
    means = sums / jnp.maximum(cnts, 1.0)[:, None]
    if feats is None:
        return means, out_mask
    return means[:, :3], out_mask, means[:, 3]
