"""Voxel-hash map: kNN vs brute force, insert hysteresis, prune semantics."""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu.map import hash_map as hm

RNG = np.random.default_rng(11)
CFG = hm.MapConfig(h_log2=12, bucket_slots=16, cell_size=1.0, voxel_size=0.5)


def build_map(points):
    m = hm.make_map(CFG, jnp.float64)
    pts = jnp.asarray(points)
    n = pts.shape[0]
    return hm.insert(
        m, CFG, pts, jnp.ones(n, bool), jnp.zeros(n, bool)
    )  # no downsample: keep all


def brute_knn(points, queries, k):
    d2 = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    return np.take_along_axis(d2, idx, axis=1)


def test_knn_matches_brute_force_within_cell_radius():
    """Inside the guaranteed coverage radius (= cell_size/2 for the 2x2x2
    round-to-corner region) the hash-grid kNN must agree exactly with brute
    force."""
    pts = RNG.uniform(-8, 8, size=(2000, 3))
    m = build_map(pts)
    queries = RNG.uniform(-6, 6, size=(100, 3))
    nbrs, sq, found = hm.knn_search(m, CFG, jnp.asarray(queries), k=5)
    sq_bf = brute_knn(pts, queries, 5)
    sq = np.asarray(sq)
    for i in range(len(queries)):
        for j in range(5):
            if sq_bf[i, j] <= (CFG.cell_size / 2) ** 2:
                assert abs(sq[i, j] - sq_bf[i, j]) < 1e-9, (i, j, sq[i, j], sq_bf[i, j])


def test_knn_neighbors_are_real_points():
    pts = RNG.uniform(-5, 5, size=(500, 3))
    m = build_map(pts)
    q = RNG.uniform(-4, 4, size=(40, 3))
    nbrs, sq, found = hm.knn_search(m, CFG, jnp.asarray(q), k=5)
    nbrs = np.asarray(nbrs)
    for i in range(40):
        for j in range(5):
            if bool(found[i, j]):
                d = np.abs(pts - nbrs[i, j]).sum(-1).min()
                assert d < 1e-9


def test_empty_map_returns_nothing():
    m = hm.make_map(CFG, jnp.float64)
    nbrs, sq, found = hm.knn_search(m, CFG, jnp.zeros((4, 3)), k=5)
    assert not np.asarray(found).any()
    assert np.isinf(np.asarray(sq)).all()


def test_insert_downsample_keeps_nearest_to_voxel_center():
    m = hm.make_map(CFG, jnp.float64)
    # three points in the same 0.5 voxel [0, 0.5)^3; center (0.25,0.25,0.25)
    pts = jnp.asarray(
        [[0.40, 0.40, 0.40], [0.26, 0.24, 0.25], [0.05, 0.05, 0.05]]
    )
    m = hm.insert(m, CFG, pts, jnp.ones(3, bool), jnp.ones(3, bool))
    assert int(hm.map_size(m)) == 1
    kept = hm.flatten(m)
    np.testing.assert_allclose(kept[0], [0.26, 0.24, 0.25], atol=0)


def test_insert_downsample_replaces_incumbent():
    m = hm.make_map(CFG, jnp.float64)
    first = jnp.asarray([[0.05, 0.05, 0.05]])
    m = hm.insert(m, CFG, first, jnp.ones(1, bool), jnp.ones(1, bool))
    better = jnp.asarray([[0.24, 0.26, 0.25]])
    m = hm.insert(m, CFG, better, jnp.ones(1, bool), jnp.ones(1, bool))
    assert int(hm.map_size(m)) == 1
    kept = hm.flatten(m)
    np.testing.assert_allclose(kept[0], [0.24, 0.26, 0.25], atol=0)
    worse = jnp.asarray([[0.4, 0.4, 0.4]])
    m = hm.insert(m, CFG, worse, jnp.ones(1, bool), jnp.ones(1, bool))
    kept = hm.flatten(m)
    assert int(hm.map_size(m)) == 1
    np.testing.assert_allclose(kept[0], [0.24, 0.26, 0.25], atol=0)


def test_insert_no_downsample_keeps_duplicates():
    m = hm.make_map(CFG, jnp.float64)
    pts = jnp.asarray([[0.1, 0.1, 0.1], [0.12, 0.1, 0.1], [0.14, 0.1, 0.1]])
    m = hm.insert(m, CFG, pts, jnp.ones(3, bool), jnp.zeros(3, bool))
    assert int(hm.map_size(m)) == 3


def test_insert_mask_respected():
    m = hm.make_map(CFG, jnp.float64)
    pts = jnp.asarray(RNG.uniform(-3, 3, size=(64, 3)))
    mask = jnp.asarray(np.arange(64) < 10)
    m = hm.insert(m, CFG, pts, mask, jnp.zeros(64, bool))
    assert int(hm.map_size(m)) == 10


def test_prune_outside_box():
    pts = RNG.uniform(-10, 10, size=(800, 3))
    m = build_map(pts)
    lo, hi = jnp.asarray([-5.0, -5.0, -5.0]), jnp.asarray([5.0, 5.0, 5.0])
    m2 = hm.prune_outside(m, lo, hi)
    expected = int(((pts >= -5) & (pts <= 5)).all(-1).sum())
    assert int(hm.map_size(m2)) == expected
    # pruned map returns no neighbors outside the box
    nbrs, sq, found = hm.knn_search(m2, CFG, jnp.asarray([[9.0, 9.0, 9.0]]), k=5)
    nb = np.asarray(nbrs[0])[np.asarray(found[0])]
    if len(nb):
        assert (np.abs(nb) <= 5.0 + 1e-9).all()


def test_insert_decisions_hysteresis():
    """Reference policy (laserMapping.cpp:438-466)."""
    vox = 0.5
    p = jnp.asarray([[0.30, 0.30, 0.30]])  # voxel center (0.25,...)
    mask = jnp.ones(1, bool)
    inited = jnp.asarray(True)

    # (a) nearest neighbor far outside the voxel on every axis -> add, no ds
    far = np.tile([3.0, 3.0, 3.0], (5, 1))
    add, ds = hm.insert_decisions(
        p, mask, jnp.asarray(far)[None], jnp.ones((1, 5), bool), inited, vox
    )
    assert bool(add[0]) and not bool(ds[0])

    # (b) a neighbor closer to the voxel center -> skip
    near = np.tile([0.26, 0.26, 0.26], (5, 1))
    add, ds = hm.insert_decisions(
        p, mask, jnp.asarray(near)[None], jnp.ones((1, 5), bool), inited, vox
    )
    assert not bool(add[0])

    # (c) neighbors in-voxel but all farther from center -> add with ds
    far_in = np.tile([0.45, 0.45, 0.45], (5, 1))
    add, ds = hm.insert_decisions(
        p, mask, jnp.asarray(far_in)[None], jnp.ones((1, 5), bool), inited, vox
    )
    assert bool(add[0]) and bool(ds[0])

    # (d) no neighbors -> add with ds
    add, ds = hm.insert_decisions(
        p, mask, jnp.zeros((1, 5, 3)), jnp.zeros((1, 5), bool), inited, vox
    )
    assert bool(add[0]) and bool(ds[0])


def test_insert_no_key_aliasing_at_det_range_450_scale():
    """Regression (VERDICT r4 weak #6): the r4 dedup key clipped voxel
    coords relative to the batch min to 10 bits/axis, so a scan spanning
    >1023 voxels per axis (det_range=450 m at 0.5 m map voxels = up to
    ~1800) could alias two distinct voxels to one key and silently drop a
    real point.  The r5 two-key layout carries 15 bits/axis.

    Deterministic trigger for the old code: several far points whose rel-x
    all clip to 1023 share one dedup key; whichever are adjacent in the
    sorted order lose to the run head."""
    cfg = hm.MapConfig(h_log2=12, bucket_slots=16, cell_size=2.0,
                       voxel_size=0.5)
    m = hm.make_map(cfg, jnp.float64)
    # anchor at voxel 0 pins the batch-min ref; far points at voxels
    # 1100/1200/1300/1400 on x (550-700 m, all > 1023 voxels from ref)
    pts = jnp.asarray([
        [0.1, 0.1, 0.1],
        [550.1, 0.1, 0.1],
        [600.1, 0.1, 0.1],
        [650.1, 0.1, 0.1],
        [700.1, 0.1, 0.1],
    ])
    n = pts.shape[0]
    m = hm.insert(m, cfg, pts, jnp.ones(n, bool), jnp.ones(n, bool))
    assert int(hm.map_size(m)) == n  # old 10-bit keys dropped >= 2 of these
    kept = np.sort(np.asarray(hm.flatten(m))[:, 0])
    np.testing.assert_allclose(kept, np.sort(np.asarray(pts)[:, 0]), atol=0)


def test_insert_wide_span_randomized_matches_numpy_dedup():
    """900 m-span batch (det_range-450 scale): the device insert's dedup
    winner set must equal a numpy reference dedup (nearest-to-voxel-center
    per voxel) exactly."""
    cfg = hm.MapConfig(h_log2=12, bucket_slots=16, cell_size=2.0,
                       voxel_size=0.5)
    rng = np.random.default_rng(450)
    pts = rng.uniform(-450, 450, size=(2048, 3))
    vox = np.floor(pts / cfg.voxel_size).astype(np.int64)
    mid = (vox + 0.5) * cfg.voxel_size
    d_mid = ((pts - mid) ** 2).sum(-1)
    winners = {}
    for i in range(len(pts)):
        k = tuple(vox[i])
        if k not in winners or d_mid[i] < d_mid[winners[k]]:
            winners[k] = i
    expect = np.sort(
        np.asarray([pts[i] for i in winners.values()]), axis=0)

    m = hm.make_map(cfg, jnp.float64)
    m = hm.insert(m, cfg, jnp.asarray(pts), jnp.ones(len(pts), bool),
                  jnp.ones(len(pts), bool))
    assert int(np.asarray(m.dropped)) == 0
    got = np.sort(np.asarray(hm.flatten(m)), axis=0)
    assert got.shape == expect.shape
    np.testing.assert_allclose(got, expect, atol=0)


def test_partial_wide_compaction_matches_full_wide():
    """r5 partial-wide: the wide fallback searched only for UNSATURATED
    queries (compacted into K_w slots) must return bit-identical results to
    the full all-queries wide search — saturated narrow results are exact
    by the coverage-radius argument (pipeline.make_knn_fn)."""
    import dataclasses

    from fast_lio_tpu.config import Config, LidarType
    from fast_lio_tpu.pipeline import make_knn_fn

    cfg_map = hm.MapConfig(h_log2=12, bucket_slots=64, cell_size=2.5,
                           voxel_size=0.5)
    rng = np.random.default_rng(7)
    # dense cluster (saturates its queries) + sparse far-field (unsaturated)
    dense = rng.uniform(-5, 5, (3000, 3))
    sparse = rng.uniform(20, 60, (60, 3))
    pts = jnp.asarray(np.concatenate([dense, sparse]))
    m = hm.make_map(cfg_map, jnp.float64)
    m = hm.insert(m, cfg_map, pts, jnp.ones(len(pts), bool),
                  jnp.zeros(len(pts), bool))

    queries = jnp.asarray(np.concatenate([
        rng.uniform(-4, 4, (200, 3)),      # saturated region
        rng.uniform(20, 60, (56, 3)),      # unsaturated region
    ]))
    mask = jnp.ones(len(queries), bool)

    base_cfg = Config(lidar_type=LidarType.AVIA, knn_wide_fallback=True)
    for k_w in (64, 8):  # 8 < expected unsat count -> full-wide arm
        fn = make_knn_fn(
            dataclasses.replace(base_cfg, knn_wide_max_queries=k_w),
            cfg_map, m)
        fn_full = make_knn_fn(
            dataclasses.replace(base_cfg, knn_wide_max_queries=0),
            cfg_map, m)
        n1, s1, f1 = fn(queries, mask)
        n2, s2, f2 = fn_full(queries, mask)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=0)
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=0)
