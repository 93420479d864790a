"""Packet synchronization (sync_packages parity, laserMapping.cpp:368-424)."""
import numpy as np

from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import SyncBuffer


def mk(n=100, t0=10.0):
    pts = np.random.default_rng(0).uniform(1, 5, (n, 3)).astype(np.float32)
    ptt = np.linspace(0, 0.1, n)
    return t0, pts, ptt


def test_waits_for_imu():
    sb = SyncBuffer(Config())
    t0, pts, ptt = mk()
    sb.push_lidar(t0, pts, ptt)
    sb.push_imu(t0 + 0.05, [0, 0, 9.8], [0, 0, 0])
    assert sb.pop_packet() is None  # IMU hasn't reached scan end yet
    sb.push_imu(t0 + 0.11, [0, 0, 9.8], [0, 0, 0])
    pkt = sb.pop_packet()
    assert pkt is not None
    np.testing.assert_allclose(pkt.lidar_end_time, t0 + 0.1)
    # only IMU samples <= scan end enter the packet
    assert (pkt.imu_t <= pkt.lidar_end_time + 1e-12).all()


def test_previous_tail_sample_prepended():
    sb = SyncBuffer(Config())
    t0, pts, ptt = mk()
    for i in range(25):
        sb.push_imu(t0 - 0.05 + i * 0.01, [0, 0, 9.8], [0, 0, 0])
    sb.push_lidar(t0, pts, ptt)
    pkt1 = sb.pop_packet()
    sb.push_lidar(t0 + 0.1, pts, ptt)
    for i in range(25):
        sb.push_imu(t0 + 0.2 + i * 0.01, [0, 0, 9.8], [0, 0, 0])
    pkt2 = sb.pop_packet()
    # packet 2's first IMU sample is packet 1's tail (IMU_Processing.hpp:220)
    assert pkt2.imu_t[0] == pkt1.imu_t[-1]


def test_mean_scantime_fallback():
    sb = SyncBuffer(Config())
    t0, pts, ptt = mk()
    sb.push_imu(t0 + 0.2, [0, 0, 9.8], [0, 0, 0])
    sb.push_lidar(t0, pts, ptt)
    sb.pop_packet()
    # degenerate scan (1 point): end time falls back to mean scantime
    sb.push_lidar(t0 + 0.1, pts[:1], ptt[:1])
    sb.push_imu(t0 + 0.3, [0, 0, 9.8], [0, 0, 0])
    pkt = sb.pop_packet()
    np.testing.assert_allclose(pkt.lidar_end_time, t0 + 0.1 + 0.1)


def test_loopback_clears_buffers():
    sb = SyncBuffer(Config())
    t0, pts, ptt = mk()
    sb.push_lidar(t0, pts, ptt)
    sb.push_lidar(t0 - 5.0, pts, ptt)  # time jumped backwards
    assert len(sb.lidar_buf) == 1
    sb.push_imu(t0, [0, 0, 9.8], [0, 0, 0])
    sb.push_imu(t0 - 5.0, [0, 0, 9.8], [0, 0, 0])
    assert len(sb.imu_t) == 1


def test_soft_time_sync():
    """time_sync_en estimates a one-shot clock offset when LiDAR and IMU
    clocks differ by > 1 s (laserMapping.cpp:319-324,343-347)."""
    cfg = Config(time_sync_en=True)
    sb = SyncBuffer(cfg)
    # IMU clock runs 5 s behind the LiDAR clock
    for i in range(5):
        sb.push_imu(5.0 + i * 0.01, [0, 0, 9.8], [0, 0, 0])
    sb.push_lidar(10.0, *mk()[1:])
    assert sb.timediff_set
    np.testing.assert_allclose(sb.timediff_lidar_wrt_imu, 10.0 + 0.1 - 5.04)
    # subsequent IMU stamps are re-based into the LiDAR clock
    sb.push_imu(5.05, [0, 0, 9.8], [0, 0, 0])
    assert abs(sb.imu_t[-1] - (5.05 + sb.timediff_lidar_wrt_imu)) < 1e-9
