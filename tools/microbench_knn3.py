"""Part 3 (round 2): candidate-selection and gather-scaling experiments.

Questions this answers on-chip:
  1. Is lax.top_k(k=5) the right selector, or are 5 iterative min-reductions
     (threshold trick) cheaper?
  2. How does XLA row-gather cost scale with row count (is unique-bucket
     pooling worth it)?
  3. Cost of the fully fused formulation: gather + d2 + 5-min thresholds +
     masked plane-fit sums, no top_k, no (N,C,3) neighbor materialization.
Run manually: python tools/microbench_knn3.py
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
buckets = jnp.asarray(rng.integers(0, H, size=(NQ, NR)), jnp.int32)
packed = jnp.asarray(rng.normal(size=(H, 4 * B)), jnp.float32)
q = jnp.asarray(rng.normal(size=(NQ, 3)), jnp.float32)
d2_in = jnp.asarray(rng.random((NQ, C)), jnp.float32)


def timeit(name, fn, *args, reps=50):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:52s} {best*1e3:8.3f} ms")
    return out


@jax.jit
def sel_topk(d2):
    neg, idx = jax.lax.top_k(-d2, 5)
    return -neg


@jax.jit
def sel_iter_min(d2):
    """5 iterative (min, mask-one-element) rounds; returns the 5 thresholds."""
    lanes = jnp.arange(C, dtype=jnp.int32)[None, :]
    ms = []
    for _ in range(5):
        m = jnp.min(d2, axis=-1, keepdims=True)
        lane = jnp.min(jnp.where(d2 == m, lanes, C), axis=-1, keepdims=True)
        d2 = jnp.where(lanes == lane, jnp.inf, d2)
        ms.append(m)
    return jnp.concatenate(ms, axis=-1)


def gather_n(n_rows):
    idx = jnp.asarray(rng.integers(0, H, size=(n_rows,)), jnp.int32)

    @jax.jit
    def f(idx):
        return packed[idx].sum()

    return f, idx


@jax.jit
def fused_sums(buckets, q):
    """gather + d2 + 5 thresholds + masked sums (S1, S2 diag+offdiag, nn0)."""
    rows = packed[buckets.reshape(-1)].reshape(NQ, NR, 4 * B)
    x = rows[:, :, 0 * B:1 * B].reshape(NQ, C)
    y = rows[:, :, 1 * B:2 * B].reshape(NQ, C)
    z = rows[:, :, 2 * B:3 * B].reshape(NQ, C)
    w = rows[:, :, 3 * B:4 * B].reshape(NQ, C)
    d2 = ((x - q[:, None, 0]) ** 2 + (y - q[:, None, 1]) ** 2
          + (z - q[:, None, 2]) ** 2 + w * w)
    lanes = jnp.arange(C, dtype=jnp.int32)[None, :]
    d2w = d2
    sel = jnp.zeros_like(d2, dtype=bool)
    ms = []
    for _ in range(5):
        m = jnp.min(d2w, axis=-1, keepdims=True)
        lane = jnp.min(jnp.where(d2w == m, lanes, C), axis=-1, keepdims=True)
        hit = lanes == lane
        sel = sel | hit
        d2w = jnp.where(hit, jnp.inf, d2w)
        ms.append(m)
    selc = sel.astype(jnp.float32)
    s1 = jnp.stack([(x * selc).sum(-1), (y * selc).sum(-1), (z * selc).sum(-1)], -1)
    s2 = jnp.stack([
        (x * x * selc).sum(-1), (y * y * selc).sum(-1), (z * z * selc).sum(-1),
        (x * y * selc).sum(-1), (x * z * selc).sum(-1), (y * z * selc).sum(-1),
    ], -1)
    return jnp.concatenate(ms, -1), s1, s2


@jax.jit
def fused_extract(buckets, q):
    """gather + d2 + 5 rounds extracting neighbor coords via one-hot sums."""
    rows = packed[buckets.reshape(-1)].reshape(NQ, NR, 4 * B)
    x = rows[:, :, 0 * B:1 * B].reshape(NQ, C)
    y = rows[:, :, 1 * B:2 * B].reshape(NQ, C)
    z = rows[:, :, 2 * B:3 * B].reshape(NQ, C)
    w = rows[:, :, 3 * B:4 * B].reshape(NQ, C)
    d2 = ((x - q[:, None, 0]) ** 2 + (y - q[:, None, 1]) ** 2
          + (z - q[:, None, 2]) ** 2 + w * w)
    lanes = jnp.arange(C, dtype=jnp.int32)[None, :]
    outs = []
    for _ in range(5):
        m = jnp.min(d2, axis=-1, keepdims=True)
        lane = jnp.min(jnp.where(d2 == m, lanes, C), axis=-1, keepdims=True)
        hit = (lanes == lane).astype(jnp.float32)
        nx = (x * hit).sum(-1)
        ny = (y * hit).sum(-1)
        nz = (z * hit).sum(-1)
        d2 = jnp.where(lanes == lane, jnp.inf, d2)
        outs.append(jnp.stack([nx, ny, nz, m[:, 0]], -1))
    return jnp.stack(outs, 1)  # (NQ, 5, 4)


if __name__ == "__main__":
    timeit("top_k(5) on (4096,512)", sel_topk, d2_in)
    timeit("5x iter-min on (4096,512)", sel_iter_min, d2_in)
    for n in (2048, 8192, 32768):
        f, idx = gather_n(n)
        timeit(f"gather {n} rows of 1KB", f, idx)
    timeit("fused: gather+d2+5min+masked sums", fused_sums, buckets, q)
    timeit("fused: gather+d2+5min+extract nbrs", fused_extract, buckets, q)
