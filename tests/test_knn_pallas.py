"""Pallas kNN kernel vs the XLA reference path (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from pathlib import Path

from fast_lio_tpu.map import hash_map as hm

def _load_tool(name):
    # load tools/<name>.py without touching sys.path (ADVICE r4: a path
    # prepend would shadow same-named installed modules session-wide)
    import importlib.util
    p = Path(__file__).resolve().parent.parent / "tools" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(name, p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod

kp = _load_tool("knn_pallas")

RNG = np.random.default_rng(7)
CFG = hm.MapConfig(h_log2=10, bucket_slots=16, cell_size=1.0, voxel_size=0.5)


def build_map(points):
    m = hm.make_map(CFG, jnp.float32)
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    return hm.insert(m, CFG, pts, jnp.ones(n, bool), jnp.zeros(n, bool))


def _compare(m, queries, wide=False):
    nb_x, sq_x, f_x = hm.knn_search(m, CFG, jnp.asarray(queries, jnp.float32),
                                    k=5, wide=wide)
    nb_p, sq_p, f_p = kp.knn_search_pallas(
        m, CFG, jnp.asarray(queries, jnp.float32), wide=wide, interpret=True
    )
    sq_x, sq_p = np.asarray(sq_x), np.asarray(sq_p)
    f_x, f_p = np.asarray(f_x), np.asarray(f_p)
    nb_x, nb_p = np.asarray(nb_x), np.asarray(nb_p)
    assert (f_x == f_p).all(), "found masks differ"
    # identical distances (tie ORDER may differ, the sorted multiset may not)
    np.testing.assert_allclose(
        np.where(f_x, sq_x, 0.0), np.where(f_p, sq_p, 0.0), rtol=1e-5, atol=1e-6
    )
    # neighbor sets: where distances are strictly distinct, points must match
    for i in range(len(queries)):
        for j in range(5):
            if not f_x[i, j]:
                continue
            dup = (np.abs(sq_x[i] - sq_x[i, j]) < 1e-9).sum() > 1
            if not dup:
                np.testing.assert_allclose(
                    nb_x[i, j], nb_p[i, j], rtol=1e-6, atol=1e-6
                )


def test_kernel_matches_xla_dense():
    pts = RNG.uniform(-6, 6, size=(3000, 3)).astype(np.float32)
    m = build_map(pts)
    q = RNG.uniform(-5, 5, size=(64, 3)).astype(np.float32)
    _compare(m, q)


def test_kernel_matches_xla_sparse_and_empty_regions():
    # clusters + lone points + queries in empty space
    pts = np.concatenate([
        RNG.uniform(-2, 2, size=(500, 3)),
        np.array([[8.0, 8.0, 8.0], [8.3, 8.0, 8.0], [-7.0, 5.0, 0.0]]),
    ]).astype(np.float32)
    m = build_map(pts)
    q = np.concatenate([
        RNG.uniform(-2, 2, size=(16, 3)),
        np.array([[8.1, 8.0, 8.0], [20.0, 20.0, 20.0], [-7.2, 5.1, 0.0]]),
        np.zeros((13, 3)),
    ]).astype(np.float32)
    _compare(m, q)


def test_kernel_matches_xla_wide():
    pts = RNG.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    m = build_map(pts)
    q = RNG.uniform(-4, 4, size=(32, 3)).astype(np.float32)
    _compare(m, q, wide=True)


def test_kernel_found_counts_match_region_brute_force():
    pts = RNG.uniform(-3, 3, size=(200, 3)).astype(np.float32)
    m = build_map(pts)
    q = RNG.uniform(-3, 3, size=(24, 3)).astype(np.float32)
    nb, sq, found = kp.knn_search_pallas(
        m, CFG, jnp.asarray(q), interpret=True
    )
    found = np.asarray(found)
    for i, qi in enumerate(q):
        base = np.floor(qi / CFG.cell_size - 0.5)
        lo, hi = base * CFG.cell_size, (base + 2) * CFG.cell_size
        in_region = ((pts >= lo) & (pts < hi)).all(-1)
        assert found[i].sum() == min(5, int(in_region.sum()))
