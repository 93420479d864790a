"""Per-vendor decoder semantics (preprocess.cpp parity)."""
import numpy as np

from fast_lio_tpu.config import AVIA, OUSTER64, VELODYNE, Config, LidarType, TimeUnit
from fast_lio_tpu.preprocess.drivers import (
    decode_avia,
    decode_marsim,
    decode_ouster,
    decode_velodyne,
)

RNG = np.random.default_rng(31)


def test_avia_tag_line_and_blind_gates():
    cfg = Config(lidar_type=LidarType.AVIA, n_scans=6, blind=2.0, point_filter_num=1)
    n = 10
    xyz = np.tile(np.linspace(3, 12, n)[:, None], (1, 3))  # all beyond blind
    refl = np.arange(n, dtype=np.float32)
    t_ns = (np.arange(n) * 1e5).astype(np.int64)
    tag = np.full(n, 0x10, np.uint8)
    line = np.zeros(n, np.uint8)

    tag[3] = 0x20  # bad tag -> dropped
    line[4] = 7  # line >= N_SCANS -> dropped
    xyz[5] = [0.1, 0.1, 0.1]  # inside blind -> dropped

    scan = decode_avia(xyz, refl, t_ns, tag, line, cfg)
    # index 0 always dropped (loop starts at 1); 3,4,5 dropped
    assert len(scan.pts) == n - 4
    assert 3.0 not in scan.intensity and 4.0 not in scan.intensity
    np.testing.assert_allclose(scan.time_offset_s, t_ns[[1, 2, 6, 7, 8, 9]] * 1e-9)


def test_avia_decimation_counts_valid_only():
    cfg = Config(lidar_type=LidarType.AVIA, n_scans=6, blind=0.1, point_filter_num=3)
    n = 31
    xyz = np.tile(np.linspace(1, 4, n)[:, None], (1, 3))
    scan = decode_avia(
        xyz, np.zeros(n, np.float32), np.zeros(n, np.int64),
        np.full(n, 0x10, np.uint8), np.zeros(n, np.uint8), cfg,
    )
    # valid_num = 1..30 over indices 1..30; keep valid_num % 3 == 0 -> 10 pts
    assert len(scan.pts) == 10


def test_avia_duplicate_suppression():
    cfg = Config(lidar_type=LidarType.AVIA, n_scans=6, blind=0.1, point_filter_num=1)
    xyz = np.array([[1, 1, 1], [2, 2, 2], [2, 2, 2], [3, 3, 3]], float)
    scan = decode_avia(
        xyz, np.zeros(4, np.float32), np.zeros(4, np.int64),
        np.full(4, 0x10, np.uint8), np.zeros(4, np.uint8), cfg,
    )
    assert len(scan.pts) == 2  # idx 0 skipped, idx 2 duplicate


def test_ouster_units_and_decimation():
    cfg = Config(lidar_type=LidarType.OUST64, blind=1.0, point_filter_num=2,
                 time_unit=TimeUnit.NS)
    n = 8
    xyz = np.tile(np.linspace(2, 9, n)[:, None], (1, 3))
    t = (np.arange(n) * 1e6).astype(np.int64)  # ns
    scan = decode_ouster(xyz, np.ones(n, np.float32), t, cfg)
    assert len(scan.pts) == 4  # every 2nd
    np.testing.assert_allclose(scan.time_offset_s, [0, 2e-3, 4e-3, 6e-3])


def test_velodyne_given_time():
    cfg = Config(lidar_type=LidarType.VELO16, blind=1.0, point_filter_num=1,
                 time_unit=TimeUnit.MS)
    n = 6
    xyz = np.tile(np.linspace(2, 7, n)[:, None], (1, 3))
    t = np.linspace(0, 100, n)  # ms
    ring = np.zeros(n, np.uint16)
    scan = decode_velodyne(xyz, np.ones(n, np.float32), t, ring, cfg)
    np.testing.assert_allclose(scan.time_offset_s, t * 1e-3)


def test_velodyne_azimuth_reconstruction():
    """No per-point time: offsets must be reconstructed from azimuth at
    omega = 0.361 * SCAN_RATE deg/ms and be monotone along the sweep."""
    cfg = Config(lidar_type=LidarType.VELO16, blind=0.5, point_filter_num=1,
                 scan_rate=10)
    n = 90
    # clockwise sweep (decreasing yaw = forward scan time), radius 5
    yaw = np.deg2rad(np.linspace(170, -170, n))
    xyz = np.stack([5 * np.cos(yaw), 5 * np.sin(yaw), np.zeros(n)], -1)
    t = np.zeros(n)  # missing
    ring = np.zeros(n, np.uint16)
    scan = decode_velodyne(xyz, np.ones(n, np.float32), t, ring, cfg)
    assert len(scan.pts) == n - 1  # first point of the ring dropped
    dt = np.diff(scan.time_offset_s)
    assert (dt > 0).all()
    # full sweep of 340 deg at 3.61 deg/ms ~ 94.2 ms
    np.testing.assert_allclose(
        scan.time_offset_s[-1], (340 / 3.61) * 1e-3, rtol=0.02
    )


def test_marsim_zero_offsets():
    cfg = Config(lidar_type=LidarType.MARSIM, blind=0.5)
    xyz = RNG.uniform(1, 5, (20, 3))
    scan = decode_marsim(xyz, np.ones(20, np.float32), cfg)
    assert (scan.time_offset_s == 0).all()
    assert len(scan.pts) == 20


def test_presets_parity():
    """Preset key values mirror the reference config/*.yaml."""
    assert AVIA.blind == 4.0 and AVIA.point_filter_num == 3
    assert AVIA.time_unit == TimeUnit.US and AVIA.det_range == 450.0
    assert OUSTER64.time_unit == TimeUnit.NS and OUSTER64.n_scans == 64
    assert VELODYNE.time_unit == TimeUnit.MS and VELODYNE.n_scans == 16
