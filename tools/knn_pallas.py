"""Fused Pallas TPU kernel for voxel-hash kNN — the ikd-Tree
``Nearest_Search`` hot op (/root/reference/src/laserMapping.cpp:670).

Why a kernel: XLA's row gather on this backend carries a large FIXED cost
(~0.6 ms per gather op regardless of row count — measured in
tools/microbench_knn.py), and the kNN needs R=8 bucket rows for each of
~4096 queries, 2-3 times per scan.  The kernel instead:

  1. bulk-DMAs the ENTIRE packed map (H x 4B planar rows, hash_map.Map) from
     HBM into VMEM once per call — one descriptor, full HBM bandwidth
     (~8 MB => ~15 us), feasible because the map is a fixed-capacity array;
  2. expands each query's (deduped) bucket list with dynamic VMEM row reads
     — VMEM random access costs cycles, not HBM latency;
  3. computes masked squared distances per candidate slot (the w channel of
     the planar row IS the free-slot penalty, and hash collisions are killed
     exactly by the region AABB check — same semantics as
     hash_map.knn_search);
  4. selects the k=5 nearest per query with 5 (min, argmin-lane, one-hot
     extract) rounds — no sort, no top_k, no (N, C, 3) candidate
     materialization in HBM.

Semantics match hash_map.knn_search exactly (same region, same collision
filtering) except tie order among equidistant candidates, which is
irrelevant downstream (the 5-NN SET feeds a plane fit).

The kernel requires the map to fit in VMEM (packed bytes <= ~12 MB, i.e.
h_log2 <= 13 at 64 slots).

STATUS — DEMOTED to tools/ (round 4, VERDICT r3 item 8): measured ON CHIP
this kernel loses to the XLA region-gather both end-to-end (161.3 vs 212.7
scans/s, r3) and per search (1.40 vs 0.46 ms, r4 microbench_grouped) —
the per-query serial VMEM row loop costs more than XLA's batched gather +
one-hot MXU winner extraction.  It is NOT wired into the pipeline
(Config.knn_backend accepts only "auto"/"xla"); it stays here runnable,
with interpret-mode parity tests (tests/test_knn_pallas.py), as the
starting point if the map layout ever makes XLA's gather the bottleneck.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_lio_tpu.map import hash_map as hm

QG = 8  # queries per grid program (one sublane tile)
K = hm.NUM_MATCH_POINTS
VMEM_MAP_LIMIT = 12 * 1024 * 1024  # bytes of packed map the kernel accepts


def supports(cfg: hm.MapConfig) -> bool:
    return cfg.num_buckets * cfg.row_width * 4 <= VMEM_MAP_LIMIT


def _kernel(H, B, R, cell_size, buckets_ref, q_ref, map_ref,
            xo_ref, yo_ref, zo_ref, d2o_ref, mapv, cand, sem):
    W = 4 * B
    C = R * B
    f32 = jnp.float32
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _load_map():
        cp = pltpu.make_async_copy(map_ref, mapv.at[pl.ds(0, H), :], sem)
        cp.start()
        cp.wait()
        # sentinel row (index H): free-slot w in every lane so duplicate
        # bucket entries contribute d2 >= 1e18 and are never selected
        mapv[pl.ds(H, 8), :] = jnp.full((8, W), hm.W_FREE, f32)

    # ---- expand: R rows per query, slab-major into cand ----
    # buckets_ref is FLAT (N*R,) int32 in SMEM (a 2-D (N, R) operand would be
    # lane-padded to (N, 128) and overflow the 1 MB SMEM)
    def read_row(i, _):
        qi = i % QG
        oi = i // QG
        b = buckets_ref[(g * QG + qi) * R + oi]
        cand[pl.ds(oi * QG + qi, 1), :] = mapv[pl.ds(b, 1), :]
        return 0

    jax.lax.fori_loop(0, QG * R, read_row, 0)

    # ---- per-slab masked distances, packed compact ----
    q = q_ref[...]  # (QG, 4) [x, y, z, pad]
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

    d2s = []
    xs = []
    ys = []
    zs = []
    for o in range(R):
        rows = cand[o * QG:(o + 1) * QG, :]  # (QG, W)
        sx = rows[:, 0 * B:1 * B]
        sy = rows[:, 1 * B:2 * B]
        sz = rows[:, 2 * B:3 * B]
        sw = rows[:, 3 * B:4 * B]
        d2 = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2 + sw
        oob = ((sx < lox) | (sx >= lox + span)
               | (sy < loy) | (sy >= loy + span)
               | (sz < loz) | (sz >= loz + span))
        d2s.append(jnp.where(oob, hm._OOB, d2))
        xs.append(sx)
        ys.append(sy)
        zs.append(sz)
    d2q = jnp.concatenate(d2s, axis=1)  # (QG, C)
    xq = jnp.concatenate(xs, axis=1)
    yq = jnp.concatenate(ys, axis=1)
    zq = jnp.concatenate(zs, axis=1)

    cnt = jnp.sum((d2q < hm.W_VALID_MAX).astype(f32), axis=1, keepdims=True)

    # ---- top-5 select + extract ----
    lanes = jax.lax.broadcasted_iota(jnp.int32, (QG, C), 1)
    xcol, ycol, zcol, dcol = [], [], [], []
    for _ in range(K):
        m = jnp.min(d2q, axis=1, keepdims=True)  # (QG, 1)
        l = jnp.min(jnp.where(d2q == m, lanes, C), axis=1, keepdims=True)
        hit = (lanes == l).astype(f32)  # exactly-one-hot
        xcol.append(jnp.sum(xq * hit, axis=1, keepdims=True))
        ycol.append(jnp.sum(yq * hit, axis=1, keepdims=True))
        zcol.append(jnp.sum(zq * hit, axis=1, keepdims=True))
        dcol.append(m)
        d2q = jnp.where(lanes == l, 2.0 * hm._OOB, d2q)

    pad = jnp.zeros((QG, 8 - K - 1), f32)
    xo_ref[...] = jnp.concatenate(xcol + [cnt, pad], axis=1)
    yo_ref[...] = jnp.concatenate(ycol + [cnt, pad], axis=1)
    zo_ref[...] = jnp.concatenate(zcol + [cnt, pad], axis=1)
    d2o_ref[...] = jnp.concatenate(dcol + [cnt, pad], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "k", "wide", "interpret", "return_candidates"),
)
def knn_search_pallas(
    m: hm.Map, cfg: hm.MapConfig, queries: jnp.ndarray,
    k: int = K, wide: bool = False, interpret: bool = False,
    return_candidates: bool = False,
):
    """Drop-in replacement for hash_map.knn_search (kernel path).

    queries (N, 3) with N a multiple of 8; k must be NUM_MATCH_POINTS.
    Returns (nbrs (N, k, 3), sq (N, k) with +inf where missing, found).
    """
    assert k == K, "kernel is specialized to k=5 (NUM_MATCH_POINTS)"
    assert not return_candidates, "kernel path does not materialize candidates"
    H, B = cfg.num_buckets, cfg.bucket_slots
    N = queries.shape[0]
    assert N % QG == 0, f"query count {N} must be a multiple of {QG}"

    base, cells, R = hm.region_cells(queries, cfg, wide)
    buckets, _dup = hm.dedup_buckets(hm._bucket_of(cells, cfg.h_log2), H)
    buckets = buckets.reshape(-1)  # flat: SMEM-friendly (see _kernel)

    q4 = jnp.concatenate(
        [queries.astype(jnp.float32), jnp.zeros((N, 1), jnp.float32)], axis=-1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // QG,),
        in_specs=[
            pl.BlockSpec((QG, 4), lambda g, b: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # map rows stay in HBM
        ],
        out_specs=[
            pl.BlockSpec((QG, 8), lambda g, b: (g, 0),
                         memory_space=pltpu.VMEM)
        ] * 4,
        scratch_shapes=[
            pltpu.VMEM((H + 8, 4 * B), jnp.float32),
            pltpu.VMEM((QG * R, 4 * B), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((N, 8), jnp.float32)] * 4
    kern = functools.partial(_kernel, H, B, R, float(cfg.cell_size))
    xo, yo, zo, d2o = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(H + 8) * 4 * B * 4 + 4 * 1024 * 1024,
        ),
        interpret=interpret,
    )(buckets, q4, m.packed)

    sq = d2o[:, :k]
    found = sq < hm.W_VALID_MAX
    nbrs = jnp.stack([xo[:, :k], yo[:, :k], zo[:, :k]], axis=-1)
    sq = jnp.where(found, sq, jnp.inf)
    return nbrs.astype(queries.dtype), sq.astype(queries.dtype), found
