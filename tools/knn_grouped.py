"""Grouped Pallas kNN kernel — region-shared row loads (round-4 rework).

STATUS — DEMOTED to tools/ (measured on chip, r4): 22.7 ms/search vs XLA's
0.46 at bench shapes (50x slower; wide 23.4 vs 2.87).  Two structural
reasons: (a) real query sets group far worse than the design assumed —
bench-like distributions give ~1.3 queries/region, not ~16, so the shared
row loads buy little; (b) the single-program sequential group loop (~3.6k
fori iterations of DMA-latency-bound row reads) cannot compete with XLA's
one giant vectorized gather + fused min-sweeps, which keeps the whole VPU
busy.  Kept runnable + parity-tested (tests/test_knn_grouped.py) as a
negative result with the measurement methodology in tools/microbench_grouped.

The round-3 kernel (map.knn_pallas) lost to XLA because it paid R dynamic
VMEM row reads PER QUERY (64 serial slices per 8-query program).  This
rework exploits the dominant structural fact of a LiDAR scan: queries are
voxel-downsample centroids, so ~10-20 of them share each storage cell —
and same-cell queries have the IDENTICAL search region (the round-to-corner
2x2x2 / centered 3x3x3 of hash_map.region_cells).  Sorting queries by
region key and processing them in groups of up to 8 loads each region's R
rows ONCE per group instead of once per query:

    row loads:  N*R  ->  R * n_groups   (n_groups ~ N/8 + n_distinct_cells)

Pipeline shape (wrapper):
  1. XLA prep: region key per query (static-origin fused int32 key, the
     ADVICE r3-safe per-point clamp), one argsort, group starts via
     segment machinery;
  2. ONE Pallas program: bulk-DMA the map to VMEM, dynamic fori over the
     (traced) group count; per group 8 row slices + a fully vectorized
     (8, R*B) masked-distance + 5x(min, one-hot extract) block — identical
     math to knn_pallas._kernel;
  3. XLA post: unsort via one scatter-built inverse permutation.

Group g writes rows [start_g, start_g + 8); starts are ascending and at
most 8 apart, so a group's tail overlap into the next region is REWRITTEN
by the later group's correct results (ascending sequential loop) — no
scatter, no padded group array.

Semantics are EXACTLY hash_map.knn_search(..., wide=...) (same region, same
AABB collision filter, same dedup) up to tie order among equidistant
candidates.  Supports wide (R=27) natively — where XLA's 27-row gather is
3.4x the standard traffic, this kernel still loads each region once.

Out-of-range queries (|coord| beyond ~610 m at the default 1.2 m cell) clamp
to the boundary region KEY — they may group with a boundary region and
search the wrong rows; such points are km-scale outliers the preprocessing
blind/range gates never emit.  The map must fit VMEM (knn_pallas.supports).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_lio_tpu.map import hash_map as hm

K = hm.NUM_MATCH_POINTS
G = 8  # queries per group (one sublane tile)
KEY_BITS = 10  # per-axis region-key bits; 2^9 cells each side of origin


def _kernel(H, B, R, cell_size, n_groups_ref, starts_ref, buckets_ref,
            q_ref, map_ref, xo_ref, yo_ref, zo_ref, d2o_ref,
            mapv, cand, sem):
    W = 4 * B
    C = R * B
    f32 = jnp.float32

    cp = pltpu.make_async_copy(map_ref, mapv.at[pl.ds(0, H), :], sem)
    cp.start()
    cp.wait()
    # sentinel row (index H): free-slot w in every lane so duplicate bucket
    # entries contribute d2 >= 1e18 and are never selected
    mapv[pl.ds(H, 8), :] = jnp.full((8, W), hm.W_FREE, f32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)

    def body(g, _):
        s = starts_ref[g]

        # ---- load the group's R region rows (shared by all 8 queries) ----
        def read_row(o, _):
            b = buckets_ref[s * R + o]
            cand[pl.ds(o, 1), :] = mapv[pl.ds(b, 1), :]
            return 0

        jax.lax.fori_loop(0, R, read_row, 0, unroll=True)

        q = q_ref[pl.ds(s, G), :]  # (G, 4) [x, y, z, pad]
        qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
        if R == 8:  # round-to-corner 2x2x2
            lox = jnp.floor(qx / cell_size - 0.5) * cell_size
            loy = jnp.floor(qy / cell_size - 0.5) * cell_size
            loz = jnp.floor(qz / cell_size - 0.5) * cell_size
            span = 2.0 * cell_size
        else:  # centered 3x3x3 (wide)
            lox = jnp.floor(qx / cell_size - 1.0) * cell_size
            loy = jnp.floor(qy / cell_size - 1.0) * cell_size
            loz = jnp.floor(qz / cell_size - 1.0) * cell_size
            span = 3.0 * cell_size

        d2s, xs, ys, zs = [], [], [], []
        for o in range(R):
            # Slice each channel straight from the VMEM ref: a ref load is
            # address-based so lanes 128:192 come out as tile-1/offset-0.
            # Slicing a loaded (1, 4B) vector instead gives Mosaic an
            # in-register lane offset >= 128 -> "Invalid input layout" on the
            # (1,B)->(G,B) broadcast (observed on-chip, r4).
            sx = cand[o:o + 1, 0 * B:1 * B]
            sy = cand[o:o + 1, 1 * B:2 * B]
            sz = cand[o:o + 1, 2 * B:3 * B]
            sw = cand[o:o + 1, 3 * B:4 * B]
            d2 = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2 + sw
            oob = ((sx < lox) | (sx >= lox + span)
                   | (sy < loy) | (sy >= loy + span)
                   | (sz < loz) | (sz >= loz + span))
            d2s.append(jnp.where(oob, hm._OOB, d2))
            xs.append(jnp.broadcast_to(sx, (G, B)))
            ys.append(jnp.broadcast_to(sy, (G, B)))
            zs.append(jnp.broadcast_to(sz, (G, B)))
        d2q = jnp.concatenate(d2s, axis=1)  # (G, C)
        xq = jnp.concatenate(xs, axis=1)
        yq = jnp.concatenate(ys, axis=1)
        zq = jnp.concatenate(zs, axis=1)

        cnt = jnp.sum((d2q < hm.W_VALID_MAX).astype(f32), axis=1,
                      keepdims=True)

        xcol, ycol, zcol, dcol = [], [], [], []
        for _ in range(K):
            mn = jnp.min(d2q, axis=1, keepdims=True)  # (G, 1)
            l = jnp.min(jnp.where(d2q == mn, lanes, C), axis=1, keepdims=True)
            hit = (lanes == l).astype(f32)  # exactly-one-hot
            xcol.append(jnp.sum(xq * hit, axis=1, keepdims=True))
            ycol.append(jnp.sum(yq * hit, axis=1, keepdims=True))
            zcol.append(jnp.sum(zq * hit, axis=1, keepdims=True))
            dcol.append(mn)
            d2q = jnp.where(lanes == l, 2.0 * hm._OOB, d2q)

        pad = jnp.zeros((G, 8 - K - 1), f32)
        xo_ref[pl.ds(s, G), :] = jnp.concatenate(xcol + [cnt, pad], axis=1)
        yo_ref[pl.ds(s, G), :] = jnp.concatenate(ycol + [cnt, pad], axis=1)
        zo_ref[pl.ds(s, G), :] = jnp.concatenate(zcol + [cnt, pad], axis=1)
        d2o_ref[pl.ds(s, G), :] = jnp.concatenate(dcol + [cnt, pad], axis=1)
        return 0

    jax.lax.fori_loop(0, n_groups_ref[0], body, 0)


def _region_key(base: jnp.ndarray) -> jnp.ndarray:
    """Fused int32 key of region base cells with a STATIC origin (per-point
    clamp only — a far outlier never perturbs in-bound keys; ADVICE r3)."""
    half = 1 << (KEY_BITS - 1)
    rel = jnp.clip(base + half, 0, (1 << KEY_BITS) - 1)
    return (rel[:, 0] << (2 * KEY_BITS)) | (rel[:, 1] << KEY_BITS) | rel[:, 2]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "wide", "interpret", "return_candidates"),
)
def knn_search_grouped(
    m: hm.Map, cfg: hm.MapConfig, queries: jnp.ndarray,
    k: int = K, wide: bool = False, interpret: bool = False,
    return_candidates: bool = False,
):
    """Drop-in replacement for hash_map.knn_search (grouped kernel path)."""
    assert k == K, "kernel is specialized to k=5 (NUM_MATCH_POINTS)"
    assert not return_candidates, "kernel path does not materialize candidates"
    H, B = cfg.num_buckets, cfg.bucket_slots
    N = queries.shape[0]

    base, cells, R = hm.region_cells(queries, cfg, wide)
    buckets, _dup = hm.dedup_buckets(hm._bucket_of(cells, cfg.h_log2), H)

    # ---- sort by region key; group starts every 8 queries or key change ---
    key = _region_key(base)
    order = jnp.argsort(key)
    ksort = key[order]
    head = jnp.concatenate([jnp.array([True]), ksort[1:] != ksort[:-1]])
    idx = jnp.arange(N, dtype=jnp.int32)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, idx, 0))
    rank = idx - seg_start
    gnew = jnp.logical_or(head, (rank % G) == 0)
    gid = jnp.cumsum(gnew.astype(jnp.int32)) - 1
    n_groups = gid[-1] + 1
    # only the group HEAD writes its start (others scatter to the dropped
    # index N) — a plain .at[gid].set would let any member win
    starts = jnp.zeros(N, jnp.int32).at[
        jnp.where(gnew, gid, N)].set(idx, mode="drop")

    q_sorted = queries[order].astype(jnp.float32)
    q4 = jnp.concatenate([q_sorted, jnp.zeros((N, 1), jnp.float32)], -1)
    q4 = jnp.concatenate([q4, jnp.zeros((G, 4), jnp.float32)], 0)  # tail pad
    buckets_sorted = buckets[order].astype(jnp.int32).reshape(-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # n_groups, starts, buckets (SMEM)
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q4
            pl.BlockSpec(memory_space=pl.ANY),  # map rows stay in HBM
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((H + 8, 4 * B), jnp.float32),
            pltpu.VMEM((R, 4 * B), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((N + G, 8), jnp.float32)] * 4
    kern = functools.partial(_kernel, H, B, R, float(cfg.cell_size))
    xo, yo, zo, d2o = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(H + 8) * 4 * B * 4 + 8 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray([n_groups], jnp.int32), starts, buckets_sorted,
      q4, m.packed)

    # ---- unsort (inverse permutation built with one cheap scatter) --------
    inv = jnp.zeros(N, jnp.int32).at[order].set(idx)
    sq = d2o[inv, :k]
    found = sq < hm.W_VALID_MAX
    nbrs = jnp.stack([xo[inv, :k], yo[inv, :k], zo[inv, :k]], axis=-1)
    sq = jnp.where(found, sq, jnp.inf)
    return nbrs.astype(queries.dtype), sq.astype(queries.dtype), found
