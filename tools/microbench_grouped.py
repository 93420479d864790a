"""Direct kNN backend microbench at bench shapes (slope method).

Compares, against the live-map distribution bench.py produces at avia
shapes: XLA region-gather vs r3 Pallas kernel vs r4 grouped kernel, plus
the grouped kernel's XLA prep (sort+ranks) alone — so the keep-vs-demote
decision (VERDICT r4 item 8) can cite per-search numbers, not just e2e.

Run on the chip: python tools/microbench_grouped.py [avia|clustered|sparse]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fast_lio_tpu.map import hash_map as hm
sys.path.insert(0, str(Path(__file__).resolve().parent))
import knn_pallas as kp
from knn_grouped import _region_key, knn_search_grouped

N_LO, N_HI = 4, 24
N_Q = 4096


def make_world(mode):
    rng = np.random.default_rng(0)
    cfg = hm.make_config(voxel_size=0.3, h_log2=13, cell_multiplier=4)
    m = hm.make_map(cfg, jnp.float32)
    pts = rng.uniform(-20, 20, size=(120000, 3)).astype(np.float32)
    m = hm.insert(m, cfg, jnp.asarray(pts), jnp.ones(len(pts), bool),
                  jnp.zeros(len(pts), bool))
    if mode == "clustered":
        # the design case: ~16 queries per storage cell
        centers = rng.uniform(-15, 15, size=(N_Q // 16, 3))
        q = (centers[:, None, :] + rng.uniform(-0.55, 0.55, (N_Q // 16, 16, 3))
             ).reshape(-1, 3).astype(np.float32)
    elif mode == "sparse":
        q = rng.uniform(-19, 19, size=(N_Q, 3)).astype(np.float32)
    else:  # avia: voxel centroids of a synthetic scan = realistic clustering
        raw = rng.uniform(-15, 15, size=(2 * N_Q, 3)).astype(np.float32)
        from fast_lio_tpu.ops.voxel_grid import voxel_downsample

        c, mask = voxel_downsample(jnp.asarray(raw),
                                   jnp.ones(len(raw), bool), 0.3, N_Q)
        q = np.asarray(c)
    return cfg, m, jnp.asarray(q, jnp.float32)


def slope(name, fn, *args):
    t = {}
    for n in (N_LO, N_HI):
        jitted = jax.jit(lambda *a: fn(n, *a))
        r = jitted(*args)
        float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(r)[0])).sum())
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            r = jitted(*args)
            float(np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(r)[0])).sum())
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    print(f"{name:42s} {per*1e3:8.3f} ms/search")
    return per


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "avia"
    cfg, m, q = make_world(mode)
    n_cells = len(np.unique(np.asarray(
        _region_key(jnp.floor(q / cfg.cell_size - 0.5).astype(jnp.int32)))))
    print(f"mode={mode}: {q.shape[0]} queries over {n_cells} distinct regions "
          f"({q.shape[0]/max(n_cells,1):.1f} q/region)")

    def f_xla(n, m, q):
        def body(i, acc):
            nb, sq, fo = hm.knn_search(m, cfg, q + acc * 1e-12)
            return acc + sq.sum() + nb.sum()
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    def f_xla_wide(n, m, q):
        def body(i, acc):
            nb, sq, fo = hm.knn_search(m, cfg, q + acc * 1e-12, wide=True)
            return acc + sq.sum() + nb.sum()
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    def f_grouped(n, m, q):
        def body(i, acc):
            nb, sq, fo = knn_search_grouped(m, cfg, q + acc * 1e-12)
            return acc + sq.sum() + nb.sum()
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    def f_grouped_wide(n, m, q):
        def body(i, acc):
            nb, sq, fo = knn_search_grouped(m, cfg, q + acc * 1e-12, wide=True)
            return acc + sq.sum() + nb.sum()
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    def f_pallas(n, m, q):
        def body(i, acc):
            nb, sq, fo = kp.knn_search_pallas(m, cfg, q + acc * 1e-12)
            return acc + sq.sum() + nb.sum()
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    def f_prep(n, q):
        # the grouped kernel's XLA-side prep alone (sort + ranks + starts)
        def body(i, acc):
            base = jnp.floor((q + acc * 1e-12) / cfg.cell_size - 0.5
                             ).astype(jnp.int32)
            key = _region_key(base)
            order = jnp.argsort(key)
            ks = key[order]
            head = jnp.concatenate([jnp.array([True]), ks[1:] != ks[:-1]])
            idx = jnp.arange(len(q), dtype=jnp.int32)
            seg = jax.lax.associative_scan(
                jnp.maximum, jnp.where(head, idx, 0))
            return acc + jnp.sum(seg) * 1e-9 + order[0] * 1e-9
        return jax.lax.fori_loop(0, n, body, jnp.asarray(0.0, jnp.float32))

    slope("xla 2x2x2", f_xla, m, q)
    slope("grouped kernel 2x2x2", f_grouped, m, q)
    slope("r3 pallas 2x2x2", f_pallas, m, q)
    slope("xla wide 3x3x3", f_xla_wide, m, q)
    slope("grouped kernel wide 3x3x3", f_grouped_wide, m, q)
    slope("grouped XLA prep alone (sort+ranks)", f_prep, q)


if __name__ == "__main__":
    main()
