"""Native host library vs the numpy reference decoders."""
import numpy as np
import pytest

from fast_lio_tpu import native
from fast_lio_tpu.config import Config, LidarType, TimeUnit
from fast_lio_tpu.preprocess.drivers import decode_avia, decode_ouster

pytestmark = pytest.mark.skipif(
    not native.available(), reason="liblio_host.so not built"
)

RNG = np.random.default_rng(41)


def test_native_avia_matches_numpy():
    cfg = Config(lidar_type=LidarType.AVIA, n_scans=6, blind=2.0,
                 point_filter_num=3)
    n = 5000
    xyz = RNG.uniform(-20, 20, (n, 3))
    refl = RNG.uniform(0, 255, n).astype(np.float32)
    ons = (np.arange(n) * 1e4).astype(np.int64)
    tag = RNG.choice([0x00, 0x10, 0x20, 0x30], n).astype(np.uint8)
    line = RNG.integers(0, 8, n).astype(np.uint8)
    # some duplicates
    xyz[100] = xyz[99]
    xyz[101] = xyz[100]

    ref = decode_avia(xyz, refl, ons, tag, line, cfg)
    got_xyz, got_t, got_i = native.decode_avia(
        xyz.astype(np.float32), refl, ons, tag, line, cfg.n_scans,
        cfg.blind, cfg.point_filter_num,
    )
    assert len(got_xyz) == len(ref.pts)
    np.testing.assert_allclose(got_xyz, ref.pts, atol=0)
    np.testing.assert_allclose(got_t, ref.time_offset_s, atol=1e-12)
    np.testing.assert_allclose(got_i, ref.intensity, atol=0)


def test_native_generic_matches_numpy_ouster():
    cfg = Config(lidar_type=LidarType.OUST64, blind=1.5, point_filter_num=2,
                 time_unit=TimeUnit.NS)
    n = 3000
    xyz = RNG.uniform(-30, 30, (n, 3))
    inten = RNG.uniform(0, 100, n).astype(np.float32)
    t = (np.arange(n) * 1e5).astype(np.int64)
    ref = decode_ouster(xyz, inten, t, cfg)
    got_xyz, got_t, got_i = native.decode_generic(
        xyz.astype(np.float32), inten, t.astype(np.float64),
        cfg.blind, cfg.point_filter_num, cfg.time_unit.to_ms * 1e-3,
    )
    assert len(got_xyz) == len(ref.pts)
    np.testing.assert_allclose(got_xyz, ref.pts, atol=0)
    np.testing.assert_allclose(got_t, ref.time_offset_s, atol=1e-15)


def test_decode_dispatch_native_parity():
    """drivers.decode with the native path on vs forced numpy: identical
    RawScan for every natively-supported sensor (the integration VERDICT r2
    item 8 asked for — native is the default when the library is present)."""
    from fast_lio_tpu.preprocess.drivers import decode

    n = 4000
    msgs = {
        LidarType.AVIA: dict(
            xyz=RNG.uniform(-20, 20, (n, 3)).astype(np.float32),
            reflectivity=RNG.uniform(0, 255, n).astype(np.float32),
            offset_time_ns=(np.arange(n) * 1e4).astype(np.int64),
            tag=RNG.choice([0x00, 0x10, 0x20], n).astype(np.uint8),
            line=RNG.integers(0, 6, n).astype(np.uint8),
        ),
        LidarType.OUST64: dict(
            xyz=RNG.uniform(-30, 30, (n, 3)).astype(np.float32),
            intensity=RNG.uniform(0, 100, n).astype(np.float32),
            t=(np.arange(n) * 1e5).astype(np.int64),
        ),
        LidarType.MARSIM: dict(
            xyz=RNG.uniform(-30, 30, (n, 3)).astype(np.float32),
            intensity=RNG.uniform(0, 100, n).astype(np.float32),
        ),
    }
    for lt, msg in msgs.items():
        cfg = Config(lidar_type=lt, blind=2.0, point_filter_num=3,
                     time_unit=TimeUnit.NS)
        nat = decode(msg, cfg, use_native=True)
        ref = decode(msg, cfg, use_native=False)
        assert len(nat.pts) == len(ref.pts), lt
        np.testing.assert_allclose(nat.pts, ref.pts, atol=0)
        np.testing.assert_allclose(nat.time_offset_s, ref.time_offset_s,
                                   atol=1e-12)
        np.testing.assert_allclose(nat.intensity, ref.intensity, atol=0)


def _velo_cloud(n, n_rings=16, with_time=False):
    """A spinning-lidar-like cloud: per-ring azimuth sweep with noise, in
    interleaved ring order (the driver's point order)."""
    az = np.linspace(0.0, 2 * np.pi * 0.98, n // n_rings)
    elev = np.deg2rad(np.linspace(-15, 15, n_rings))
    pts, rings, times = [], [], []
    for i, a in enumerate(az):
        for r in range(n_rings):
            rad = 10.0 + RNG.uniform(-3, 3)
            pts.append([rad * np.cos(elev[r]) * np.cos(-a),
                        rad * np.cos(elev[r]) * np.sin(-a),
                        rad * np.sin(elev[r])])
            rings.append(r)
            times.append(i * 1e-4)  # seconds within scan
    xyz = np.asarray(pts, np.float32)
    ring = np.asarray(rings, np.uint16)
    t = (np.asarray(times) if with_time else np.zeros(len(xyz)))
    return dict(
        xyz=xyz, intensity=RNG.uniform(0, 100, len(xyz)).astype(np.float32),
        time=t, ring=ring,
    )


@pytest.mark.parametrize("with_time", [False, True])
def test_native_velodyne_matches_numpy(with_time):
    """Velodyne native decode vs numpy — incl. the azimuth-unwrap
    reconstruction path (the last per-point Python loop on ingest,
    VERDICT r3 item 7).  Unwrap times agree to <1e-9 s (the only
    difference is libm vs numpy atan2 ULPs)."""
    from fast_lio_tpu.config import TimeUnit
    from fast_lio_tpu.preprocess.drivers import decode

    cfg = Config(lidar_type=LidarType.VELO16, blind=2.0, point_filter_num=2,
                 scan_rate=10, time_unit=TimeUnit.SEC)
    msg = _velo_cloud(4800, with_time=with_time)
    nat = decode(msg, cfg, use_native=True)
    ref = decode(msg, cfg, use_native=False)
    assert len(nat.pts) == len(ref.pts)
    assert len(nat.pts) > 1000  # the gates didn't degenerate
    np.testing.assert_allclose(nat.pts, ref.pts, atol=0)
    np.testing.assert_allclose(nat.time_offset_s, ref.time_offset_s,
                               atol=1e-9)
    np.testing.assert_allclose(nat.intensity, ref.intensity, atol=0)
    if not with_time:
        # reconstruction really happened: offsets span most of the sweep
        assert nat.time_offset_s.max() > 0.05


def test_native_velodyne_wide_ring_ids_no_alias():
    """Ring ids >= 256 must keep their own unwrap state (the numpy path
    groups by exact ring value; a masked native table would alias 256→0)."""
    cfg = Config(lidar_type=LidarType.VELO16, blind=0.5, point_filter_num=1,
                 scan_rate=10)
    msg = _velo_cloud(2400, n_rings=8)
    # remap rings to sparse wide ids incl. >256 values
    wide_ids = np.array([0, 3, 250, 256, 300, 511, 1000, 40000], np.uint16)
    msg["ring"] = wide_ids[msg["ring"].astype(int)]
    from fast_lio_tpu.preprocess.drivers import decode

    nat = decode(msg, cfg, use_native=True)
    ref = decode(msg, cfg, use_native=False)
    assert len(nat.pts) == len(ref.pts)
    np.testing.assert_allclose(nat.time_offset_s, ref.time_offset_s,
                               atol=1e-9)


def test_native_velodyne_unwrap_wraparound():
    """Rings whose sweep crosses the +/-pi yaw seam exercise the +360 and
    +period fix-ups; parity must hold there too."""
    cfg = Config(lidar_type=LidarType.VELO16, blind=0.5, point_filter_num=1,
                 scan_rate=10)
    n = 1200
    # a full wrap plus a bit, starting near the seam
    az = np.linspace(np.pi - 0.1, np.pi - 0.1 + 2 * np.pi * 1.05, n // 4)
    pts, rings = [], []
    for a in az:
        for r in range(4):
            pts.append([5 * np.cos(-a), 5 * np.sin(-a), 0.1 * r])
            rings.append(r)
    msg = dict(xyz=np.asarray(pts, np.float32),
               intensity=np.ones(len(pts), np.float32),
               time=np.zeros(len(pts)),
               ring=np.asarray(rings, np.uint16))
    from fast_lio_tpu.preprocess.drivers import decode

    nat = decode(msg, cfg, use_native=True)
    ref = decode(msg, cfg, use_native=False)
    assert len(nat.pts) == len(ref.pts)
    np.testing.assert_allclose(nat.time_offset_s, ref.time_offset_s,
                               atol=1e-9)


def test_native_voxel_downsample_centroids():
    n = 2000
    xyz = RNG.uniform(-5, 5, (n, 3)).astype(np.float32)
    out = native.voxel_downsample(xyz, 0.5)
    # one centroid per occupied voxel
    keys = set(map(tuple, np.floor(xyz / 0.5).astype(int)))
    assert len(out) == len(keys)
    # each centroid equals the mean of its voxel's points
    for c in out[:50]:
        cell = tuple(np.floor(c / 0.5).astype(int))
        sel = np.all(np.floor(xyz / 0.5).astype(int) == cell, axis=1)
        np.testing.assert_allclose(c, xyz[sel].mean(axis=0), atol=1e-5)
