"""Compare map-table gather layouts on chip.

The kNN hot op is `table[buckets]` with buckets (4096, 8).  Candidate
layouts for the (H=8192, B=64) map:
  A: pts (H, B, 3) f32 + valid (H, B) bool   (current: minor dim 3)
  B: packed (H, 4*B) f32 = [x(64)|y(64)|z(64)|v(64)]  (lanes-aligned 256)
  C: packed (H, B, 4) f32                     (minor dim 4)
Run manually: python tools/microbench_gather.py
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
rng = np.random.default_rng(0)
buckets = jnp.asarray(rng.integers(0, H, size=(NQ, NR)), jnp.int32)
pts = jnp.asarray(rng.normal(size=(H, B, 3)), jnp.float32)
valid = jnp.asarray(rng.random((H, B)) < 0.5)
packed = jnp.concatenate(
    [pts[..., 0], pts[..., 1], pts[..., 2], valid.astype(jnp.float32)], axis=-1
)  # (H, 256)
packed_c = jnp.concatenate([pts, valid[..., None].astype(jnp.float32)],
                           axis=-1)  # (H, B, 4)
q = jnp.asarray(rng.normal(size=(NQ, 3)), jnp.float32)


def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:46s} {best*1e3:8.3f} ms")


@jax.jit
def gather_a(buckets, q):
    cp = pts[buckets].reshape(NQ, NR * B, 3)
    ok = valid[buckets].reshape(NQ, NR * B)
    d2 = jnp.sum((cp - q[:, None, :]) ** 2, -1)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg, idx


@jax.jit
def gather_b(buckets, q):
    rows = packed[buckets]  # (NQ, NR, 256)
    x = rows[:, :, 0 * B:1 * B].reshape(NQ, NR * B)
    y = rows[:, :, 1 * B:2 * B].reshape(NQ, NR * B)
    z = rows[:, :, 2 * B:3 * B].reshape(NQ, NR * B)
    ok = rows[:, :, 3 * B:4 * B].reshape(NQ, NR * B) > 0.5
    d2 = ((x - q[:, None, 0]) ** 2 + (y - q[:, None, 1]) ** 2
          + (z - q[:, None, 2]) ** 2)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg, idx


@jax.jit
def gather_c(buckets, q):
    rows = packed_c[buckets].reshape(NQ, NR * B, 4)
    d2 = jnp.sum((rows[..., :3] - q[:, None, :]) ** 2, -1)
    d2 = jnp.where(rows[..., 3] > 0.5, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg, idx


@jax.jit
def gather_b_flat(buckets, q):
    # single flat gather of NQ*NR rows (no 2-D gather dims)
    rows = packed[buckets.reshape(-1)]  # (NQ*NR, 256)
    rows = rows.reshape(NQ, NR, 4 * B)
    x = rows[:, :, 0 * B:1 * B].reshape(NQ, NR * B)
    y = rows[:, :, 1 * B:2 * B].reshape(NQ, NR * B)
    z = rows[:, :, 2 * B:3 * B].reshape(NQ, NR * B)
    ok = rows[:, :, 3 * B:4 * B].reshape(NQ, NR * B) > 0.5
    d2 = ((x - q[:, None, 0]) ** 2 + (y - q[:, None, 1]) ** 2
          + (z - q[:, None, 2]) ** 2)
    d2 = jnp.where(ok, d2, jnp.inf)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg, idx


@jax.jit
def gather_b_nodist(buckets):
    # gather only — isolates gather cost from distance + top-k
    return packed[buckets.reshape(-1)].sum()


@jax.jit
def topk_only(q):
    d2 = jnp.sum((pts[:NQ].reshape(NQ, B, 3).repeat(NR, 1)
                  - q[:, None, :]) ** 2, -1)
    neg, idx = jax.lax.top_k(-d2, 5)
    return neg, idx


if __name__ == "__main__":
    timeit("A: (H,B,3)+(H,B) two gathers", gather_a, buckets, q)
    timeit("B: packed (H,256) one gather", gather_b, buckets, q)
    timeit("C: packed (H,B,4) one gather", gather_c, buckets, q)
    timeit("B-flat: 1-D row indices", gather_b_flat, buckets, q)
    timeit("B gather only (no dist/topk)", gather_b_nodist, buckets)
    timeit("dist+topk only (no gather)", topk_only, q)
