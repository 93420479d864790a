"""Long-horizon, degeneracy, and bag-round-trip validation (VERDICT r3
item 3) — the closest this environment gets to the reference's canonical
rosbag replays (README.md:236-261; no real bags exist here):

  (a) 60 s run with IMU bias RANDOM WALKS actually drifting + sensor noise:
      bounded ATE and convergence of the observable bias components.
  (b) corridor (planar-degenerate) world: the plane set is rank-deficient
      along the corridor axis — the reference survives this via the robust
      plane gate + the iEKF prior (laserMapping.cpp:678-691); the pipeline
      must too: no NaN, bounded covariance, healthy n_eff, sub-cm cross-axis
      error, and a covariance that KNOWS the unobservable axis is worse.
  (c) full synthetic-bag round trip at Avia CustomMsg fidelity:
      sim -> BagWriter (real CustomMsg/Imu serialization) -> BagReader ->
      decode gates -> pipeline -> ATE.

Truth-recovery here complements tests/test_oracle_trace.py, which pins the
same filter against the reference-faithful f64 oracle on a biased noisy
trace (oracle re-runs at 600 scans are impractically slow, and agreement is
already asserted there).
"""
import numpy as np
import pytest

import jax

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import Pipeline


def _run(cfg, data):
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
    return pipe


def _small_cfg(**kw):
    base = dict(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=2048, n_ds_max=1024, n_imu_max=32, map_h_log2=13,
        det_range=40.0, cube_side_length=300.0,
    )
    base.update(kw)
    return Config(**base)


def test_long_horizon_bias_walk_drift_bounded():
    """(a) 60 s, biases random-walking, all noise sources on."""
    data = simlib.generate(simlib.SimConfig(
        duration=60.0, n_rings=8, n_azimuth=150,
        imu_gyr_bias=(0.002, -0.001, 0.0015), imu_acc_bias=(0.05, -0.03, 0.02),
        imu_gyr_bias_walk=2e-4, imu_acc_bias_walk=2e-3,
        imu_acc_noise=0.01, imu_gyr_noise=0.001, range_noise=0.01,
    ))
    pipe = _run(_small_cfg(), data)
    assert len(pipe.trajectory) > 550

    ate = simlib.ate_rmse(pipe.trajectory, data)
    assert ate < 0.30, f"60 s drift ATE {ate:.3f} m unbounded"

    h = pipe.health_check()
    assert not h["nan"]
    assert h["p_max_eig"] < 1e-2 and h["p_min_eig"] > 0

    # observable bias components track the walk: gyro-z (yaw-only motion
    # makes z the strongly observable gyro axis) and accel-x (the dominant
    # specific-force direction).  Ground truth at the final estimate time.
    bg = np.asarray(jax.device_get(pipe.x.bg))
    ba = np.asarray(jax.device_get(pipe.x.ba))
    k_end = int(np.argmin(np.abs(data.imu_t - pipe.trajectory[-1][0])))
    gt_bg, gt_ba = data.gt_gyr_bias[k_end], data.gt_acc_bias[k_end]
    assert abs(bg[2] - gt_bg[2]) < 1.5e-3, (bg, gt_bg)
    assert abs(ba[0] - gt_ba[0]) < 0.03, (ba, gt_ba)
    # the walk moved the biases enough that "not tracking" would show
    assert np.linalg.norm(gt_bg - (0.002, -0.001, 0.0015)) > 5e-4


def test_corridor_degeneracy_graceful():
    """(b) rank-deficient plane set: corridor walls/floor/ceiling carry no
    information along the corridor (x) axis."""
    world = simlib.World(
        room_lo=np.array([-40.0, -2.0, 0.0]),
        room_hi=np.array([120.0, 2.0, 3.0]),
        pillars=(),
    )
    traj = simlib.Trajectory(radius=200.0, omega=0.0025, z_amp=0.2)
    data = simlib.generate(simlib.SimConfig(
        duration=20.0, n_rings=8, n_azimuth=150, max_range=15.0,
        range_noise=0.01, imu_acc_noise=0.01, imu_gyr_noise=0.001,
    ), traj=traj, world=world)
    pipe = _run(_small_cfg(det_range=15.0), data)

    h = pipe.health_check()
    assert not h["nan"], "filter NaN'd in the degenerate corridor"
    assert np.isfinite(h["p_max_eig"]) and h["p_max_eig"] < 1e-1
    assert int(pipe.diags[-1].n_effective) > 100  # update kept working

    est_p, gt_p = simlib._matched_positions(pipe.get_trajectory(), data)
    err = (est_p - (est_p[0] - gt_p[0])) - gt_p
    # constrained axes stay tight while x dead-reckons on the IMU
    assert np.abs(err[:, 1]).max() < 0.05, "y (wall-constrained) drifted"
    assert np.abs(err[:, 2]).max() < 0.10, "z (floor-constrained) drifted"

    # the covariance must KNOW x is unobservable: its variance dominates
    P = np.asarray(jax.device_get(pipe.P))
    assert P[0, 0] > 3.0 * P[1, 1], (P[0, 0], P[1, 1])
    assert P[0, 0] > 3.0 * P[2, 2], (P[0, 0], P[2, 2])


def test_avia_bag_round_trip_e2e(tmp_path):
    """(c) sim -> CustomMsg bag -> reader -> decode -> pipeline -> ATE."""
    from fast_lio_tpu.io.rosbag import (BagWriter, replay_into_pipeline,
                                        serialize_imu, serialize_livox)

    # the proven test_e2e geometry (16x400); sparser noise-free grids alias
    # against the voxel lattice and are NOT robust scenarios
    data = simlib.generate(simlib.SimConfig(duration=4.0, n_rings=16,
                                            n_azimuth=400))
    bag = tmp_path / "sim_avia.bag"
    w = BagWriter(bag)
    rng = np.random.default_rng(3)
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = float(data.scan_stamps[k])
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= stamp + 1e-9:
            w.write("/livox/imu", "sensor_msgs/Imu", float(data.imu_t[imu_i]),
                    serialize_imu(float(data.imu_t[imu_i]),
                                  data.imu_acc[imu_i], data.imu_gyr[imu_i]))
            imu_i += 1
        pts = data.scans[k]
        n = len(pts)
        # real CustomMsg fields: ns offsets, tag (valid 0x10/0x00 returns
        # mixed with gated 0x20 ones), line cycling through the 6 Avia lines
        offset_ns = (data.scan_pt_times[k] * 1e9).astype(np.uint32)
        tag = rng.choice([0x10, 0x00, 0x20], n, p=[0.45, 0.45, 0.1]).astype(
            np.uint8)
        line = (np.arange(n) % 6).astype(np.uint8)
        refl = rng.uniform(0, 255, n).astype(np.float32)
        w.write("/livox/lidar", "livox_ros_driver/CustomMsg", stamp,
                serialize_livox(stamp, pts, refl, offset_ns, tag, line))
    while imu_i < len(data.imu_t):
        w.write("/livox/imu", "sensor_msgs/Imu", float(data.imu_t[imu_i]),
                serialize_imu(float(data.imu_t[imu_i]),
                              data.imu_acc[imu_i], data.imu_gyr[imu_i]))
        imu_i += 1
    w.close()

    cfg = _small_cfg(blind=0.5, point_filter_num=1, n_scans=6,
                     n_points_max=8192, n_ds_max=4096)
    pipe = Pipeline(cfg)
    n = replay_into_pipeline(bag, pipe, "/livox/lidar", "/livox/imu")
    assert n == len(data.scans)
    assert len(pipe.trajectory) > 25

    ate = simlib.ate_rmse(pipe.trajectory, data)
    assert ate < 0.10, f"bag round-trip ATE {ate:.3f} m"
    # decode really gated: 0x20-tagged returns never reached the pipeline
    assert pipe.diags[-1].n_raw < len(data.scans[-1])
    # preprocess_time was measured for every scan (CSV column source)
    assert all(d.preprocess_time > 0 for d in pipe.diags)
