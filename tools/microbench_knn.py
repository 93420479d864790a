"""kNN + downsample microbenchmarks (consolidated from the six round-1/2
iteration scripts — one file, one methodology).

All timings use the slope method: each variant loops N_LO and N_HI times
inside ONE jit with a forced host readback; the reported cost is the slope,
which cancels the tunnel round trip (jax.block_until_ready does not block
on the axon backend).

Variant groups:
  1. kNN decomposition — gather+d2, +top_k, extraction strategies
     (take_along_axis / multi-operand sort / flat re-gather / one-hot MXU
     matmul / 5x iterative min+one-hot).  The production pick is the one-hot
     MXU extraction (hash_map.knn_search); history: round-2 measured it
     ~2.3x cheaper than take_along_axis.
  2. voxel downsample — 3-key lexsort (production) vs packed 1-key argsort.

Run manually on the chip:  python tools/microbench_knn.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, B, NQ, NR = 8192, 64, 4096, 8
C = NR * B
rng = np.random.default_rng(0)
packed = jnp.asarray(rng.normal(size=(H, 4 * B)), jnp.float32)
buckets = jnp.asarray(rng.integers(0, H, size=(NQ, NR)), jnp.int32)
q = jnp.asarray(rng.normal(size=(NQ, 3)).astype(np.float32) * 3)
raw = jnp.asarray(rng.uniform(-15, 15, size=(8192, 3)), jnp.float32)
raw_mask = jnp.arange(8192) < 6400

N_LO, N_HI = 4, 24


def slope(name, make_fn, *args):
    t = {}
    for n in (N_LO, N_HI):
        f = jax.jit(make_fn(n))
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    print(f"{name:46s} {(t[N_HI]-t[N_LO])/(N_HI-N_LO)*1e3:8.3f} ms/iter")


def d2_of(bk, qq):
    rows = packed[bk.reshape(-1)].reshape(NQ, NR, 4 * B)
    cx = rows[:, :, 0 * B:1 * B].reshape(NQ, C)
    cy = rows[:, :, 1 * B:2 * B].reshape(NQ, C)
    cz = rows[:, :, 2 * B:3 * B].reshape(NQ, C)
    cw = rows[:, :, 3 * B:4 * B].reshape(NQ, C)
    d2 = ((cx - qq[:, None, 0]) ** 2 + (cy - qq[:, None, 1]) ** 2
          + (cz - qq[:, None, 2]) ** 2 + cw)
    return d2, cx, cy, cz


def mk(body):
    def make(n):
        def f(bk, qq):
            def it(i, acc):
                return acc + body((bk + i) & (H - 1), qq + acc * 1e-12)
            return jax.lax.fori_loop(0, n, it, 0.0)
        return f
    return make


# ---- group 1: kNN decomposition -------------------------------------------


def b_d2(bk, qq):
    d2, *_ = d2_of(bk, qq)
    return d2.sum()


def b_topk(bk, qq):
    d2, *_ = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg.sum()


def x_take_along(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)
    nx = jnp.take_along_axis(cx, idx, axis=1)
    ny = jnp.take_along_axis(cy, idx, axis=1)
    nz = jnp.take_along_axis(cz, idx, axis=1)
    return neg.sum() + nx.sum() + ny.sum() + nz.sum()


def x_sort(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    ds, xs, ys, zs = jax.lax.sort((d2, cx, cy, cz), dimension=1, num_keys=1)
    return ds[:, :5].sum() + xs[:, :5].sum() + ys[:, :5].sum() + zs[:, :5].sum()


def x_regather(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)
    bsel = jnp.take_along_axis(bk, idx // B, axis=1)
    slot = idx % B
    flat = bsel * (4 * B) + slot
    pf = packed.reshape(-1)
    fi = jnp.stack([flat, flat + B, flat + 2 * B], axis=-1)
    nb = pf[fi.reshape(-1)].reshape(NQ, 5, 3)
    return -neg.sum() + nb.sum()


def x_onehot(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)
    oh = jax.nn.one_hot(idx, C, dtype=jnp.float32)
    cand = jnp.stack([cx, cy, cz], axis=-1)
    nb = jnp.einsum("nkc,ncd->nkd", oh, cand,
                    preferred_element_type=jnp.float32)
    return -neg.sum() + nb.sum()


def x_iter5(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (NQ, C), 1)
    tot = 0.0
    for _ in range(5):
        m = jnp.min(d2, axis=1, keepdims=True)
        l = jnp.min(jnp.where(d2 == m, lanes, C), axis=1, keepdims=True)
        hit = (lanes == l).astype(jnp.float32)
        tot = tot + (cx * hit).sum() + (cy * hit).sum() + (cz * hit).sum() \
            + m.sum()
        d2 = jnp.where(lanes == l, jnp.inf, d2)
    return tot


def x_production(bk, qq):
    """The actual hash_map.smallest_k + one-hot extraction path."""
    from fast_lio_tpu.map.hash_map import smallest_k

    d2, cx, cy, cz = d2_of(bk, qq)
    sq, idx = smallest_k(d2, 5)
    oh = (idx[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
    cand = jnp.stack([cx, cy, cz], axis=-1)
    nb = jnp.einsum("nkc,ncd->nkd", oh, cand, precision="highest")
    return sq.sum() + nb.sum()


def x_production_d2barrier(bk, qq):
    """Same, but d2 is pinned behind an optimization barrier: the 5 min
    sweeps then re-read one materialized 8 MB f32 block instead of refusing
    into the 33 MB channel gather (whether XLA's fusion choice or the
    barrier wins is an empirical question — r4)."""
    from fast_lio_tpu.map.hash_map import smallest_k

    d2, cx, cy, cz = d2_of(bk, qq)
    d2 = jax.lax.optimization_barrier(d2)
    sq, idx = smallest_k(d2, 5)
    oh = (idx[:, :, None] == jnp.arange(C)[None, None, :]).astype(jnp.float32)
    cand = jnp.stack([cx, cy, cz], axis=-1)
    nb = jnp.einsum("nkc,ncd->nkd", oh, cand, precision="highest")
    return sq.sum() + nb.sum()


# ---- group 2: voxel downsample ---------------------------------------------


def ds_lexsort(bk, qq):
    from fast_lio_tpu.ops.voxel_grid import voxel_downsample
    c, om = voxel_downsample(raw + qq[0, 0] * 1e-12, raw_mask, 0.3, 4096)
    return c.sum()


def ds_packed(bk, qq):
    pts = raw + qq[0, 0] * 1e-12
    leaf, n_out = 0.3, 4096
    cell = jnp.floor(pts / leaf).astype(jnp.int32)
    ref = jnp.min(jnp.where(raw_mask[:, None], cell, 2**20), axis=0)
    rel = jnp.clip(cell - ref, 0, 1023)
    key = (rel[:, 0] << 20) | (rel[:, 1] << 10) | rel[:, 2]
    key = jnp.where(raw_mask, key, jnp.int32(2**30))
    order = jnp.argsort(key)
    ks = key[order]
    pts_s = pts[order]
    live_s = ks < 2**30
    first = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
    first = first & live_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(live_s, jnp.minimum(seg, n_out), n_out)
    w = live_s.astype(jnp.float32)
    sums = jax.ops.segment_sum(pts_s * w[:, None], seg, num_segments=n_out + 1)
    cnts = jax.ops.segment_sum(w, seg, num_segments=n_out + 1)
    return (sums[:n_out] / jnp.maximum(cnts[:n_out], 1.0)[:, None]).sum()


# ---- group 3: insert dedup sort (r5) ---------------------------------------
# the r4 insert sorted 3 operands (d_mid f32, key_lo, key_hi); r5 drops
# d_mid from the comparator and resolves per-voxel winners with a segmented
# min over the sorted order.  These isolate that tradeoff at insert shapes.

_ins_rng = np.random.default_rng(3)
_ins_keyhi = jnp.asarray(_ins_rng.integers(0, 1 << 29, size=8192), jnp.int32)
_ins_keylo = jnp.asarray(_ins_rng.integers(0, 1 << 30, size=8192), jnp.int32)
_ins_dmid = jnp.asarray(_ins_rng.uniform(0, 1, size=8192), jnp.float32)


def ins_sort3(bk, qq):
    khi = _ins_keyhi + jnp.int32(qq[0, 0] * 1e-12)
    order = jnp.lexsort((_ins_dmid, _ins_keylo, khi))
    shi, slo = khi[order], _ins_keylo[order]
    first = jnp.concatenate(
        [jnp.array([True]), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    return order.sum() + first.sum()


def ins_sort2_segmin(bk, qq):
    khi = _ins_keyhi + jnp.int32(qq[0, 0] * 1e-12)
    order = jnp.lexsort((_ins_keylo, khi))
    shi, slo = khi[order], _ins_keylo[order]
    first = jnp.concatenate(
        [jnp.array([True]), (shi[1:] != shi[:-1]) | (slo[1:] != slo[:-1])])
    dmid_s = _ins_dmid[order]
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_min = jax.ops.segment_min(dmid_s, seg, num_segments=8192,
                                  indices_are_sorted=True)
    elig = dmid_s == seg_min[seg]
    ex = jnp.cumsum(elig.astype(jnp.int32)) - elig
    base = jax.lax.associative_scan(jnp.maximum, jnp.where(first, ex, 0))
    first_elig = elig & (ex == base)
    return order.sum() + first_elig.sum()


def ins_full(bk, qq):
    from fast_lio_tpu.map import hash_map as hm
    cfg = hm.MapConfig(h_log2=13, bucket_slots=64, cell_size=1.2,
                       voxel_size=0.3)
    m = hm.make_map(cfg, jnp.float32)
    # two chained inserts: empty-map appends, then a perturbed re-insert
    # exercising the same-voxel replace path
    m = hm.insert(m, cfg, raw + qq[0, 0] * 1e-12, raw_mask,
                  jnp.ones_like(raw_mask))
    m = hm.insert(m, cfg, raw + 0.01, raw_mask, jnp.ones_like(raw_mask))
    return m.packed.sum()


if __name__ == "__main__":
    slope("gather+d2 only", mk(b_d2), buckets, q)
    slope("gather+d2+top_k", mk(b_topk), buckets, q)
    slope("extract: take_along_axis", mk(x_take_along), buckets, q)
    slope("extract: multi-operand sort + slice", mk(x_sort), buckets, q)
    slope("extract: flat scalar re-gather", mk(x_regather), buckets, q)
    slope("extract: one-hot MXU matmul (production)", mk(x_onehot), buckets, q)
    slope("extract: 5x iterative min+one-hot", mk(x_iter5), buckets, q)
    slope("production smallest_k + one-hot", mk(x_production), buckets, q)
    slope("production + d2 optimization_barrier", mk(x_production_d2barrier),
          buckets, q)
    slope("voxel downsample: 3-key lexsort (prod)", mk(ds_lexsort), buckets, q)
    slope("voxel downsample: packed 1-key argsort", mk(ds_packed), buckets, q)
    slope("insert sort: r4 3-operand lexsort", mk(ins_sort3), buckets, q)
    slope("insert sort: r5 2-key + segmented min", mk(ins_sort2_segmin),
          buckets, q)
    slope("insert: full production path", mk(ins_full), buckets, q)
