"""Grouped Pallas kNN kernel (DEMOTED to tools/knn_grouped.py — lost on
chip, PERF.md "kNN backends") vs the XLA reference path (interpret mode on
CPU).  Exercises exactly the structure the kernel exploits: many queries
sharing a storage cell (voxel-downsample centroids) plus the degenerate
cases (all-distinct cells, empty regions, ties)."""
from pathlib import Path

import numpy as np

import jax.numpy as jnp

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

knn_search_grouped = _load_tool("knn_grouped").knn_search_grouped

RNG = np.random.default_rng(11)
CFG = hm.MapConfig(h_log2=10, bucket_slots=16, cell_size=1.0, voxel_size=0.5)


def build_map(points):
    m = hm.make_map(CFG, jnp.float32)
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    return hm.insert(m, CFG, pts, jnp.ones(n, bool), jnp.zeros(n, bool))


def _compare(m, queries, wide=False):
    nb_x, sq_x, f_x = hm.knn_search(m, CFG, jnp.asarray(queries, jnp.float32),
                                    k=5, wide=wide)
    nb_p, sq_p, f_p = knn_search_grouped(
        m, CFG, jnp.asarray(queries, jnp.float32), wide=wide, interpret=True
    )
    sq_x, sq_p = np.asarray(sq_x), np.asarray(sq_p)
    f_x, f_p = np.asarray(f_x), np.asarray(f_p)
    nb_x, nb_p = np.asarray(nb_x), np.asarray(nb_p)
    assert (f_x == f_p).all(), "found masks differ"
    np.testing.assert_allclose(
        np.where(f_x, sq_x, 0.0), np.where(f_p, sq_p, 0.0), rtol=1e-5,
        atol=1e-6,
    )
    for i in range(len(queries)):
        for j in range(5):
            if not f_x[i, j]:
                continue
            dup = (np.abs(sq_x[i] - sq_x[i, j]) < 1e-9).sum() > 1
            if not dup:
                np.testing.assert_allclose(
                    nb_x[i, j], nb_p[i, j], rtol=1e-6, atol=1e-6
                )


def test_grouped_matches_xla_scanlike_clusters():
    """The design case: queries clustered ~15 per storage cell."""
    pts = RNG.uniform(-6, 6, size=(4000, 3)).astype(np.float32)
    m = build_map(pts)
    centers = RNG.uniform(-5, 5, size=(12, 3))
    q = np.concatenate([
        c + RNG.uniform(-0.45, 0.45, size=(15, 3)) for c in centers
    ]).astype(np.float32)  # 180 queries, ~15 per cell
    _compare(m, q)


def test_grouped_matches_xla_all_distinct_cells():
    """Worst case for grouping: every query in its own cell (sparse scan)."""
    pts = RNG.uniform(-8, 8, size=(2000, 3)).astype(np.float32)
    m = build_map(pts)
    g = np.stack(np.meshgrid(*[np.arange(4)] * 3, indexing="ij"), -1)
    q = (g.reshape(-1, 3) * CFG.cell_size * 2.0 - 4.0
         + RNG.uniform(0.1, 0.9, (64, 3))).astype(np.float32)
    _compare(m, q)


def test_grouped_matches_xla_sparse_and_empty_regions():
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


def test_grouped_matches_xla_wide():
    pts = RNG.uniform(-4, 4, size=(800, 3)).astype(np.float32)
    m = build_map(pts)
    centers = RNG.uniform(-3, 3, size=(6, 3))
    q = np.concatenate([
        c + RNG.uniform(-0.45, 0.45, size=(8, 3)) for c in centers
    ]).astype(np.float32)
    _compare(m, q, wide=True)


def test_grouped_not_multiple_of_8():
    """Group machinery must not require N % 8 == 0."""
    pts = RNG.uniform(-3, 3, size=(600, 3)).astype(np.float32)
    m = build_map(pts)
    q = RNG.uniform(-3, 3, size=(37, 3)).astype(np.float32)
    _compare(m, q)


def test_grouped_backend_pipeline_e2e(monkeypatch):
    """The demoted grouped kernel through the FULL pipeline (update loop,
    insert feedback) — injected by patching hash_map.knn_search, since the
    production wiring only exposes the XLA backend; interpret mode on CPU."""
    import functools

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import Config, LidarType
    from fast_lio_tpu.pipeline import Pipeline

    def grouped_as_knn_search(m, cfg_, queries, k=5, wide=False, **kw):
        return knn_search_grouped(m, cfg_, queries, k=k, wide=wide,
                                  interpret=True)

    monkeypatch.setattr(hm, "knn_search", grouped_as_knn_search)

    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=1024, n_ds_max=512, n_imu_max=32, map_h_log2=11,
        det_range=40.0, cube_side_length=300.0,
    )
    data = simlib.generate(simlib.SimConfig(duration=1.5, n_rings=8,
                                            n_azimuth=100))
    pipe = Pipeline(cfg)
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        end = stamp + 0.1
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= end + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while pipe.spin_once():
            pass
    ate = simlib.ate_rmse(pipe.trajectory, data)
    assert ate < 0.05, f"grouped-backend pipeline ATE {ate*100:.1f} cm"
    assert int(pipe.diags[-1].n_effective) > 100


def test_grouped_tie_lattice():
    """Equidistant candidates: distances must still match as multisets."""
    pts = np.stack(np.meshgrid(*[np.arange(6) * 0.5] * 3, indexing="ij"),
                   -1).reshape(-1, 3).astype(np.float32)
    m = build_map(pts)
    q = (pts[::7] + 0.25).astype(np.float32)
    _compare(m, q)
