"""Part 6: neighbor-coordinate extraction strategies after top_k.

take_along_axis on the (N, C) candidate block costs ~0.7 ms (part 5) — more
than gather+d2+top_k combined.  Variants:
  A. multi-operand sort (d2 key, x/y/z payload), slice first 5
  B. flat scalar re-gather from the map by (bucket, slot) of the winners
  C. one-hot matmul extraction (MXU)
Run manually: python tools/microbench_knn6.py
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


def v_sort(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    ds, xs, ys, zs = jax.lax.sort((d2, cx, cy, cz), dimension=1, num_keys=1)
    return ds[:, :5].sum() + xs[:, :5].sum() + ys[:, :5].sum() + zs[:, :5].sum()


def v_regather(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)  # idx in [0, C)
    bsel = jnp.take_along_axis(bk, idx // B, axis=1)  # (NQ,5) bucket ids
    slot = idx % B
    flat = bsel * (4 * B) + slot  # x channel offsets
    pf = packed.reshape(-1)
    fi = jnp.stack([flat, flat + B, flat + 2 * B], axis=-1)  # (NQ,5,3)
    nb = pf[fi.reshape(-1)].reshape(NQ, 5, 3)
    return -neg.sum() + nb.sum()


def v_onehot(bk, qq):
    d2, cx, cy, cz = d2_of(bk, qq)
    neg, idx = jax.lax.top_k(-d2, 5)
    oh = jax.nn.one_hot(idx, C, dtype=jnp.float32)  # (NQ, 5, C)
    cand = jnp.stack([cx, cy, cz], axis=-1)  # (NQ, C, 3)
    nb = jnp.einsum("nkc,ncd->nkd", oh, cand,
                    preferred_element_type=jnp.float32)
    return -neg.sum() + nb.sum()


if __name__ == "__main__":
    slope("A: multi-operand sort + slice", mk(v_sort), buckets, q)
    slope("B: top_k + flat scalar re-gather", mk(v_regather), buckets, q)
    slope("C: top_k + one-hot matmul", mk(v_onehot), buckets, q)
