"""Sparse-regime association (VERDICT r1 item 3).

The reference's ikd-Tree search is unbounded; it accepts a 5th NN up to
sqrt(5) ~ 2.24 m (laserMapping.cpp:671).  The hash map guarantees coverage
only within its region radius — cell_size/2 for the standard 2x2x2 search,
cell_size for the wide 3x3x3 fallback.  These tests QUANTIFY the recall gap
against brute force with the reference's gate, in exactly the regime round-1
review flagged (true 5-NN at 1-2 m, far-field sparse points), and prove the
configured remedy (cell_multiplier=5 voxels + wide fallback => coverage
2.5 m >= sqrt(5)) closes it completely at the default 0.5 m map voxel."""
import numpy as np

import jax.numpy as jnp

from fast_lio_tpu.map import hash_map as hm

RNG = np.random.default_rng(5)
MAX_NN_SQ = 5.0  # reference acceptance gate on the 5th NN (m^2)


def sparse_scene(n=3000, spacing=1.4):
    """Far-field-like scene: points on a coarse grid with jitter, typical of
    a Velodyne at 50-100 m where returns are meters apart."""
    g = np.arange(-30, 30, spacing)
    gx, gy = np.meshgrid(g, g)
    pts = np.stack([gx.ravel(), gy.ravel(),
                    0.2 * np.sin(gx.ravel()) * np.cos(gy.ravel())], -1)
    pts += RNG.normal(0, 0.15, pts.shape)
    return pts[RNG.permutation(len(pts))[:n]].astype(np.float32)


def brute_gated(pts, queries):
    """Reference association: 5-NN by brute force, accepted iff the 5th NN
    is within sqrt(5) m."""
    d2 = ((queries[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :5]
    sq = np.take_along_axis(d2, idx, axis=1)
    ok = sq[:, 4] <= MAX_NN_SQ
    return sq, ok


def build(pts, cell_multiplier, voxel=0.5):
    cfg = hm.make_config(voxel_size=voxel, h_log2=12,
                         cell_multiplier=cell_multiplier)
    m = hm.make_map(cfg, jnp.float32)
    m = hm.insert(m, cfg, jnp.asarray(pts), jnp.ones(len(pts), bool),
                  jnp.zeros(len(pts), bool))
    return cfg, m


def recall_of(pts, queries, cell_multiplier, wide):
    cfg, m = build(pts, cell_multiplier)
    nb, sq, found = hm.knn_search(m, cfg, jnp.asarray(queries), wide=wide)
    sq = np.asarray(sq)
    found = np.asarray(found)
    sq_bf, ok_bf = brute_gated(pts, queries)
    accepted = found[:, 4] & (sq[:, 4] <= MAX_NN_SQ)
    n_ref = ok_bf.sum()
    hits = (accepted & ok_bf
            & np.isclose(np.where(accepted, sq[:, 4], 0),
                         np.where(accepted, sq_bf[:, 4], 0), rtol=1e-4))
    return hits.sum() / max(n_ref, 1), n_ref


def test_standard_search_has_a_real_sparse_gap():
    """Documents the gap: at cell=4x0.5m the 2x2x2 region covers 1 m, so
    sparse scenes (5th NN at 1-2 m) lose a large fraction of the
    associations brute force with the reference gate would accept."""
    pts = sparse_scene()
    q = (pts[RNG.permutation(len(pts))[:256]]
         + RNG.normal(0, 0.3, (256, 3))).astype(np.float32)
    recall, n_ref = recall_of(pts, q, cell_multiplier=4, wide=False)
    assert n_ref > 150  # the scene genuinely exercises the gate
    assert recall < 0.8, f"expected a material gap, got recall {recall:.2f}"


def test_wide_fallback_with_cell5_reaches_reference_recall():
    """cell = 5 voxels (2.5 m) + wide 3x3x3 => guaranteed coverage 2.5 m >
    sqrt(5): every association the reference's gate accepts is found, with
    identical 5th-NN distances."""
    pts = sparse_scene()
    q = (pts[RNG.permutation(len(pts))[:256]]
         + RNG.normal(0, 0.3, (256, 3))).astype(np.float32)
    recall, n_ref = recall_of(pts, q, cell_multiplier=5, wide=True)
    assert n_ref > 150
    assert recall == 1.0, f"recall {recall:.3f} (n_ref={n_ref})"


def test_wide_fallback_never_worse_than_standard():
    pts = sparse_scene(spacing=0.9)
    q = (pts[RNG.permutation(len(pts))[:128]]
         + RNG.normal(0, 0.2, (128, 3))).astype(np.float32)
    r_std, _ = recall_of(pts, q, cell_multiplier=4, wide=False)
    r_wide, _ = recall_of(pts, q, cell_multiplier=4, wide=True)
    assert r_wide >= r_std


def test_outdoor_scale_e2e_with_wide_fallback():
    """Outdoor-scale e2e (90 x 90 m hall, walls out to ~60-100 m, 16-ring
    LiDAR seeing floor + far walls): far-field wall returns are >1 m apart,
    the regime where the standard 2x2x2 search loses associations.  The
    sparse remedy (cell = 5 voxels + wide fallback, now the default in the
    VELODYNE/OUSTER64/MID360 presets) must (a) deliver a sane trajectory and
    (b) achieve e2e association parity with the reference's unbounded search
    + sqrt(5) m gate (laserMapping.cpp:670-671), probed against f64 brute
    force over the actual live map.

    Scenario fairness was calibrated against the f64 oracle (reference math,
    exact brute-force kNN): the round-2 scenario (8 rings at +-15 deg, all
    far-field, sigma = 3 cm) diverges under the REFERENCE's own math (oracle
    ATE 217 cm — collinear single-ring 5-NN sets give degenerate plane fits),
    so it tested the scenario, not the implementation.  On this geometry the
    oracle and the pipeline agree (58 vs 54 cm at sigma = 3 cm; the pipeline
    is run at sigma = 1 cm here).  ATE bar uses the standard TUM/evo
    definition (Umeyama SE(3) alignment), as the reference's own ATE tables
    do; the unaligned first-pose ATE is bounded as a gross-divergence guard.
    """
    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import Config, LidarType
    from fast_lio_tpu.map import hash_map as hm
    from fast_lio_tpu.pipeline import Pipeline

    world = simlib.World(
        room_lo=np.array([-40.0, -20.0, 0.0]),
        room_hi=np.array([50.0, 70.0, 12.0]),
        pillars=(
            (np.array([-10.0, 8.0, 0.0]), np.array([-7.0, 11.0, 12.0])),
            (np.array([12.0, 25.0, 0.0]), np.array([15.5, 28.5, 12.0])),
        ),
    )
    traj = simlib.Trajectory(radius=12.0, omega=0.4)
    data = simlib.generate(
        simlib.SimConfig(duration=4.0, n_rings=16, n_azimuth=320,
                         elev_min=-22.0, elev_max=8.0,
                         max_range=100.0, range_noise=0.01),
        traj=traj, world=world,
    )
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.5, filter_size_map=0.5,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=12,
        det_range=100.0, cube_side_length=600.0, knn_backend="xla",
        knn_wide_fallback=True, map_cell_multiplier=5,
    )
    pipe = Pipeline(cfg)
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= stamp + 0.1 + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while pipe.spin_once():
            pass

    hc = pipe.health_check()
    assert not hc["nan"]
    # cell=5 => 128 derived slots: dense near-field cells must NOT overflow
    assert hc["map_dropped"] == 0, hc
    ate_raw = simlib.ate_rmse(pipe.trajectory, data)
    ate = simlib.ate_rmse_aligned(pipe.trajectory, data)
    assert ate_raw < 0.60, f"gross divergence: raw ATE {ate_raw*100:.1f} cm"
    assert ate < 0.25, f"outdoor-scale aligned ATE {ate*100:.1f} cm"

    # ---- e2e recall probe: association parity with the reference gate ----
    # queries = live world points of the final scan (what h_share_model
    # actually searches); truth = f64 brute force over the live map content.
    w = np.asarray(pipe.last_pts_world)
    wm = np.asarray(pipe.last_pts_world_mask)
    q = w[wm][:512].astype(np.float32)
    map_pts = hm.flatten(pipe.map)
    sq_bf, ok_bf = brute_gated(map_pts.astype(np.float64),
                               q.astype(np.float64))
    import jax.numpy as jnp

    nb, sq, found = hm.knn_search(pipe.map, pipe.map_cfg, jnp.asarray(q),
                                  wide=True)
    sq = np.asarray(sq)
    accepted = np.asarray(found)[:, 4] & (sq[:, 4] <= MAX_NN_SQ)
    n_ref = int(ok_bf.sum())
    assert n_ref > 256  # the probe genuinely exercises the gate
    hits = (accepted & ok_bf
            & np.isclose(np.where(accepted, sq[:, 4], 0),
                         np.where(accepted, sq_bf[:, 4], 0), rtol=1e-3))
    recall = hits.sum() / n_ref
    assert recall == 1.0, f"e2e recall {recall:.4f} (n_ref={n_ref})"
