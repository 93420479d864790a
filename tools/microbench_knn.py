"""Microbenchmark the kNN hot path on the real chip.

Times each component of map.hash_map.knn_search (gather, distance, top-k)
and candidate replacement strategies, to direct optimization work.
Not part of the test suite; run manually: python tools/microbench_knn.py
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fast_lio_tpu.map import hash_map as hm

N_Q = 4096
H_LOG2 = 15
SLOTS = 16
VOXEL = 0.3


def build_map(cfg, n_pts=16000, seed=0):
    """Host-built map: surface-like points (walls of a room), one per voxel."""
    rng = np.random.default_rng(seed)
    # points on 4 walls + floor of a 40x40x6 room, voxel-deduped
    pts = []
    n_per = n_pts
    xy = rng.uniform(0, 40, size=(n_per, 2))
    walls = [
        np.c_[xy[:, 0], np.zeros(n_per), rng.uniform(0, 6, n_per)],
        np.c_[xy[:, 0], np.full(n_per, 40.0), rng.uniform(0, 6, n_per)],
        np.c_[np.zeros(n_per), xy[:, 1], rng.uniform(0, 6, n_per)],
        np.c_[xy[:, 0], xy[:, 1], np.zeros(n_per)],
    ]
    pts = np.concatenate(walls).astype(np.float32)
    vox = np.floor(pts / cfg.voxel_size).astype(np.int64)
    _, keep = np.unique(
        vox[:, 0] * 10_000_00 + vox[:, 1] * 1000 + vox[:, 2], return_index=True
    )
    pts = pts[keep]
    # scatter into buckets host-side
    H, B = cfg.num_buckets, cfg.bucket_slots
    cell = np.floor(pts / cfg.cell_size).astype(np.int32)
    h = (cell[:, 0] * hm._P1) ^ (cell[:, 1] * hm._P2) ^ (cell[:, 2] * hm._P3)
    h = h.astype(np.uint32)
    h ^= h >> 16
    h = (h * np.uint32(0x85EBCA6B)) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * np.uint32(0xC2B2AE35)) & 0xFFFFFFFF
    h ^= h >> 16
    bucket = (h & (H - 1)).astype(np.int64)
    mpts = np.zeros((H, B, 3), np.float32)
    mval = np.zeros((H, B), bool)
    fill = np.zeros(H, np.int32)
    for p, b in zip(pts, bucket):
        if fill[b] < B:
            mpts[b, fill[b]] = p
            mval[b, fill[b]] = True
            fill[b] += 1
    print(f"map: {mval.sum()} pts, max bucket fill {fill.max()}", file=sys.stderr)
    return hm.Map(jnp.asarray(mpts), jnp.asarray(mval), jnp.zeros((), jnp.int32)), pts


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cfg = hm.make_config(VOXEL, H_LOG2, SLOTS)
    m, pts = build_map(cfg)
    rng = np.random.default_rng(1)
    sel = rng.integers(0, len(pts), N_Q)
    q = jnp.asarray(pts[sel] + rng.normal(0, 0.05, (N_Q, 3)).astype(np.float32))

    B = cfg.bucket_slots

    # --- components -------------------------------------------------------
    def buckets_of(queries):
        cell = hm._cell_of(queries, cfg.cell_size)
        ncells = cell[:, None, :] + hm._NEIGHBOR_OFFSETS[None, :, :]
        return hm._bucket_of(ncells, cfg.h_log2)

    @jax.jit
    def gather_only(queries):
        buckets = buckets_of(queries)
        cand = m.pts[buckets]  # (N, 27, B, 3)
        ok = m.valid[buckets]
        return jnp.sum(cand), jnp.sum(ok)

    @jax.jit
    def gather_dist(queries):
        buckets = buckets_of(queries)
        cand = m.pts[buckets].reshape(N_Q, 27 * B, 3)
        ok = m.valid[buckets].reshape(N_Q, 27 * B)
        d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        d2 = jnp.where(ok, d2, jnp.inf)
        return jnp.min(d2, axis=-1)

    @jax.jit
    def full_current(queries):
        return hm.knn_search(m, cfg, queries)

    @jax.jit
    def topk_only(d2):
        neg, idx = jax.lax.top_k(-d2, 5)
        return neg, idx

    @jax.jit
    def argmin5(d2):
        outs = []
        for _ in range(5):
            i = jnp.argmin(d2, axis=-1)
            v = jnp.take_along_axis(d2, i[:, None], axis=1)
            outs.append((v[:, 0], i))
            d2 = d2.at[jnp.arange(d2.shape[0]), i].set(jnp.inf)
        return outs

    d2_fix = jnp.asarray(
        rng.random((N_Q, 27 * B), np.float32)
    )

    print("gather_only       %7.3f ms" % timeit(gather_only, q))
    print("gather+dist       %7.3f ms" % timeit(gather_dist, q))
    print("full knn_search   %7.3f ms" % timeit(full_current, q))
    print("topk(432->5)      %7.3f ms" % timeit(topk_only, d2_fix))
    print("argmin x5         %7.3f ms" % timeit(argmin5, d2_fix))

    # --- variant: flat gather from (H*B, 3) with row indices ---------------
    pts_flat = m.pts.reshape(-1, 3)
    val_flat = m.valid.reshape(-1)

    @jax.jit
    def gather_flat(queries):
        buckets = buckets_of(queries)  # (N, 27)
        slot_idx = (buckets[..., None] * B + jnp.arange(B)).reshape(N_Q, 27 * B)
        cand = pts_flat[slot_idx]
        ok = val_flat[slot_idx]
        d2 = jnp.sum((cand - queries[:, None, :]) ** 2, axis=-1)
        return jnp.min(jnp.where(ok, d2, jnp.inf), axis=-1)

    print("gather flat+dist  %7.3f ms" % timeit(gather_flat, q))

    # --- variant: map as (H, B*4) packed rows (single gather per bucket) ---
    packed = jnp.concatenate(
        [m.pts, jnp.where(m.valid, 0.0, jnp.inf)[..., None]], axis=-1
    ).reshape(cfg.num_buckets, B * 4)

    @jax.jit
    def gather_packed(queries):
        buckets = buckets_of(queries)  # (N, 27)
        rows = packed[buckets]  # (N, 27, B*4)
        cand = rows.reshape(N_Q, 27 * B, 4)
        d2 = jnp.sum((cand[..., :3] - queries[:, None, :]) ** 2, axis=-1)
        d2 = d2 + cand[..., 3]
        return jnp.min(d2, axis=-1)

    print("gather packed     %7.3f ms" % timeit(gather_packed, q))

    # --- variant: one-bucket-per-query (queries pre-grouped upstream) ------
    @jax.jit
    def gather_1of27(queries):
        cell = hm._cell_of(queries, cfg.cell_size)
        b = hm._bucket_of(cell, cfg.h_log2)
        rows = packed[b]  # (N, B*4)
        cand = rows.reshape(N_Q, B, 4)
        d2 = jnp.sum((cand[..., :3] - queries[:, None, :]) ** 2, axis=-1)
        return jnp.min(d2 + cand[..., 3], axis=-1)

    print("gather 1-bucket   %7.3f ms" % timeit(gather_1of27, q))

    # --- variant: sorted queries (locality) ---------------------------------
    cellq = np.floor(np.asarray(q) / cfg.cell_size).astype(np.int64)
    keyq = cellq[:, 0] * 1_000_000 + cellq[:, 1] * 1000 + cellq[:, 2]
    q_sorted = jnp.asarray(np.asarray(q)[np.argsort(keyq)])
    print("gather packed (sorted q) %7.3f ms" % timeit(gather_packed, q_sorted))


if __name__ == "__main__":
    main()
