"""Part 4 (round 2): isolate gather fixed cost with in-jit loops.

Times N iterations of an op INSIDE one jit (lax.fori_loop) so per-dispatch
overhead and any per-op fixed offload cost can be told apart.
Run manually: python tools/microbench_knn4.py
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
packed = jnp.asarray(rng.normal(size=(H, 4 * B)), jnp.float32)
buckets = jnp.asarray(rng.integers(0, H, size=(NQ * NR,)), jnp.int32)
ITERS = 20


def timeit(name, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:52s} {best*1e3/ITERS:8.3f} ms/iter")


@jax.jit
def loop_gather(buckets):
    def body(i, acc):
        idx = (buckets + i) & (H - 1)
        return acc + packed[idx].sum()

    return jax.lax.fori_loop(0, ITERS, body, 0.0)


@jax.jit
def loop_gather_small(buckets):
    def body(i, acc):
        idx = (buckets[:2048] + i) & (H - 1)
        return acc + packed[idx].sum()

    return jax.lax.fori_loop(0, ITERS, body, 0.0)


@jax.jit
def loop_elementwise(buckets):
    x0 = packed * 1.000001

    def body(i, x):
        return x * 1.000001 + 0.5

    return jax.lax.fori_loop(0, ITERS, body, x0).sum()


@jax.jit
def loop_sort(buckets):
    def body(i, acc):
        return acc + jnp.sort((buckets + i) & (H - 1))[0]

    return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))


@jax.jit
def loop_scatter(buckets):
    def body(i, acc):
        idx = (buckets[:4096] + i) & (H - 1)
        return acc.at[idx].set(1.0)

    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros(H * B, jnp.float32)).sum()


if __name__ == "__main__":
    timeit("in-jit gather 32768 rows x20", loop_gather, buckets)
    timeit("in-jit gather 2048 rows x20", loop_gather_small, buckets)
    timeit("in-jit elementwise (2MB) x20", loop_elementwise, buckets)
    timeit("in-jit sort 32k int32 x20", loop_sort, buckets)
    timeit("in-jit scatter 4096 f32 x20", loop_scatter, buckets)
