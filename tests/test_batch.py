"""BatchPipeline: B vmapped lockstep streams vs B single Pipelines.

The batched step is the SAME lio_step vmapped, so each stream's trajectory
must match its single-pipeline run to numerical-fusion tolerance — and the
exhausted-stream no-op path must leave early-finished streams untouched."""
import numpy as np

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.batch import BatchPipeline
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import Pipeline


def _cfg():
    return Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=2048, n_ds_max=1024, n_imu_max=32, map_h_log2=12,
        det_range=40.0, cube_side_length=300.0,
    )


def _gen(seed, duration=2.0):
    return simlib.generate(simlib.SimConfig(
        duration=duration, n_rings=8, n_azimuth=120, range_noise=0.005,
        seed=seed))


def _feed_single(cfg, data):
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


def _write_avia_bag(path, data):
    from fast_lio_tpu.io.rosbag import (BagWriter, serialize_imu,
                                        serialize_livox)

    w = BagWriter(path)
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = float(data.scan_stamps[k])
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= stamp + 1e-9:
            w.write("/livox/lidar_imu", "sensor_msgs/Imu",
                    float(data.imu_t[imu_i]),
                    serialize_imu(float(data.imu_t[imu_i]),
                                  data.imu_acc[imu_i], data.imu_gyr[imu_i]))
            imu_i += 1
        pts = data.scans[k]
        n = len(pts)
        w.write("/livox/lidar", "livox_ros_driver/CustomMsg", stamp,
                serialize_livox(
                    stamp, pts, np.ones(n, np.float32),
                    (data.scan_pt_times[k] * 1e9).astype(np.uint32),
                    np.full(n, 0x10, np.uint8),
                    (np.arange(n) % 6).astype(np.uint8)))
    while imu_i < len(data.imu_t):
        w.write("/livox/lidar_imu", "sensor_msgs/Imu",
                float(data.imu_t[imu_i]),
                serialize_imu(float(data.imu_t[imu_i]),
                              data.imu_acc[imu_i], data.imu_gyr[imu_i]))
        imu_i += 1
    w.close()


def test_cli_multi_bag_fleet_mode(tmp_path):
    """--bag A --bag B runs both through one vmapped step and writes
    per-stream trajectories."""
    import dataclasses

    from fast_lio_tpu import cli
    from fast_lio_tpu.config import PRESETS

    datas = [_gen(0, 1.5), _gen(1, 1.5)]
    bags = []
    for i, d in enumerate(datas):
        b = tmp_path / f"s{i}.bag"
        _write_avia_bag(b, d)
        bags.append(str(b))
    rc = cli.main([
        "--preset", "avia", "--bag", bags[0], "--bag", bags[1],
        "--lid-topic", "/livox/lidar", "--imu-topic", "/livox/lidar_imu",
        "--out", str(tmp_path / "out"),
        "--point-filter-num", "1", "--blind", "0.3",
    ])
    assert rc == 0
    for i, d in enumerate(datas):
        traj = np.loadtxt(tmp_path / "out" / f"stream{i}" /
                          "trajectory_tum.txt")
        assert len(traj) > 8
        est = traj[:, 1:4]
        gt = d.gt_pos[:len(est)]
        err = (est - (est[0] - gt[0])) - gt
        assert np.sqrt((err ** 2).sum(-1).mean()) < 0.15


def test_batch_matches_single_pipelines():
    cfg = _cfg()
    # stream 1 is SHORTER: exercises the exhausted-stream no-op lanes
    datas = [_gen(0, 2.0), _gen(1, 1.5)]
    singles = [_feed_single(cfg, d) for d in datas]

    bp = BatchPipeline(cfg, 2)
    imu_i = [0, 0]
    n_rounds = max(len(d.scans) for d in datas)
    for k in range(n_rounds):
        for i, d in enumerate(datas):
            if k >= len(d.scans):
                bp.mark_done(i)
                continue
            stamp = d.scan_stamps[k]
            end = stamp + 0.1
            while imu_i[i] < len(d.imu_t) and d.imu_t[imu_i[i]] <= end + 1e-9:
                bp.push_imu(i, d.imu_t[imu_i[i]], d.imu_acc[imu_i[i]],
                            d.imu_gyr[imu_i[i]])
                imu_i[i] += 1
            bp.push_lidar(i, stamp, d.scans[k], d.scan_pt_times[k])
        while bp.spin_once():
            pass

    for i, d in enumerate(datas):
        traj_s = singles[i].get_trajectory()
        traj_b = bp.get_trajectory(i)
        assert len(traj_b) == len(traj_s), (i, len(traj_b), len(traj_s))
        ps = np.stack([p for _, p, _ in traj_s])
        pb = np.stack([p for _, p, _ in traj_b])
        # same math vmapped; tolerance covers XLA fusion differences
        np.testing.assert_allclose(pb, ps, atol=5e-4)
        ate_s = simlib.ate_rmse(singles[i].trajectory, d)
        ate_b = simlib.ate_rmse(
            [(t, p, q) for t, p, q in traj_b], d)
        assert abs(ate_b - ate_s) < 1e-3, (ate_b, ate_s)
        assert ate_b < 0.08
