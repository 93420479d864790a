"""Honest device-side op timing on the axon tunnel backend.

jax.block_until_ready does NOT synchronize on this backend (verified: an
8192^3 matmul "completes" in 26 us with block_until_ready but takes 6.7 ms
with a forced host readback).  Every measurement here therefore:
  * loops the op N times INSIDE one jit (lax.fori_loop), and
  * synchronizes by materializing a scalar to the host (np.asarray), and
  * runs two loop lengths and reports the SLOPE (per-iteration device time),
    which cancels the ~37 ms tunnel round trip and dispatch overhead.
Run manually: python tools/microbench_device.py
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

N_LO, N_HI = 4, 24


def slope(name, make_fn):
    fns = {n: jax.jit(make_fn(n)) for n in (N_LO, N_HI)}
    t = {}
    for n, f in fns.items():
        _ = np.asarray(f(buckets, q))  # compile + warm
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            _ = np.asarray(f(buckets, q))
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    print(f"{name:48s} {per*1e3:8.3f} ms/iter   (lo={t[N_LO]*1e3:.1f} hi={t[N_HI]*1e3:.1f})")


def knn_xla_body(bk, qq):
    rows = packed[bk.reshape(-1)].reshape(NQ, NR, 4 * B)
    cx = rows[:, :, 0 * B:1 * B].reshape(NQ, C)
    cy = rows[:, :, 1 * B:2 * B].reshape(NQ, C)
    cz = rows[:, :, 2 * B:3 * B].reshape(NQ, C)
    cw = rows[:, :, 3 * B:4 * B].reshape(NQ, C)
    d2 = ((cx - qq[:, None, 0]) ** 2 + (cy - qq[:, None, 1]) ** 2
          + (cz - qq[:, None, 2]) ** 2 + cw)
    neg, idx = jax.lax.top_k(-d2, 5)
    nx = jnp.take_along_axis(cx, idx, axis=1)
    return -neg, nx


def make_knn_xla(n):
    def f(bk, qq):
        def body(i, acc):
            sq, nx = knn_xla_body((bk + i) & (H - 1), qq + acc * 1e-9)
            return acc + sq.sum() + nx.sum()
        return jax.lax.fori_loop(0, n, body, 0.0)
    return f


def make_gather_only(n):
    def f(bk, qq):
        def body(i, acc):
            return acc + packed[((bk + i) & (H - 1)).reshape(-1)].sum()
        return jax.lax.fori_loop(0, n, body, 0.0)
    return f


def make_elementwise(n):
    def f(bk, qq):
        def body(i, x):
            return x * 1.000001 + 1e-6
        return jax.lax.fori_loop(0, n, body, packed).sum()
    return f


def make_sort(n):
    def f(bk, qq):
        def body(i, acc):
            return acc + jnp.sort((bk.reshape(-1) + i) & (H - 1))[0]
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    return f


def make_topk(n):
    d2 = jnp.asarray(rng.random((NQ, C)), jnp.float32)
    def f(bk, qq):
        def body(i, acc):
            neg, idx = jax.lax.top_k(-(d2 + acc * 1e-12), 5)
            return acc - neg.sum()
        return jax.lax.fori_loop(0, n, body, 0.0)
    return f


def make_scatter(n):
    def f(bk, qq):
        def body(i, x):
            idx = (bk[:, 0] * 7 + i) % (H * 4 * B)
            return x.at[idx].set(jnp.float32(i))
        return jax.lax.fori_loop(0, n, body, packed.reshape(-1)).sum()
    return f


if __name__ == "__main__":
    slope("knn XLA (gather+d2+top5+extract)", make_knn_xla)
    slope("gather 32768 rows 1KB", make_gather_only)
    slope("elementwise 2MB r/w", make_elementwise)
    slope("sort 32k int32", make_sort)
    slope("top_k(5) of (4096,512)", make_topk)
    slope("scatter 4096 scalars", make_scatter)
