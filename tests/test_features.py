"""Feature extraction: plane/edge classification on synthetic ring geometry."""
import numpy as np

from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.preprocess import features as F


def ring_on_walls(n=400, r1=10.0):
    """A ring sweeping across two perpendicular walls -> one corner."""
    # wall 1: x = r1 plane, wall 2: y = r1 plane, corner at 45 deg
    az = np.linspace(0.1, np.pi / 2 - 0.1, n)
    pts = []
    for a in az:
        d = np.array([np.cos(a), np.sin(a), 0.0])
        # distance to x=r1: r1/cos(a); to y=r1: r1/sin(a); take nearer
        t = min(r1 / np.cos(a), r1 / np.sin(a))
        pts.append(d * t)
    return np.asarray(pts)


def test_planes_detected_on_walls():
    cfg = Config(lidar_type=LidarType.AVIA, blind=0.5, point_filter_num=2)
    pts = ring_on_walls()
    (sp, si, stt), corners, ftype = F.give_feature(
        pts, np.zeros(len(pts)), np.linspace(0, 0.1, len(pts)), cfg
    )
    # most points on flat walls classify as plane (surf emitted)
    n_plane = int(np.sum((ftype == F.REAL_PLANE) | (ftype == F.POSS_PLANE)))
    assert n_plane > 0.7 * len(pts)
    assert len(sp) > 50


def test_corner_not_classified_as_plane():
    """The wall-intersection point must break the plane groups (the
    classifier cannot call a bent group a plane)."""
    cfg = Config(lidar_type=LidarType.AVIA, blind=0.5, point_filter_num=2)
    pts = ring_on_walls()
    (_sp, _si, _stt), corners, ftype = F.give_feature(
        pts, np.zeros(len(pts)), np.linspace(0, 0.1, len(pts)), cfg
    )
    corner_true = len(pts) // 2
    non_plane = [i for i in range(len(pts)) if ftype[i] not in
                 (F.REAL_PLANE, F.POSS_PLANE)]
    assert non_plane
    assert min(abs(i - corner_true) for i in non_plane) < 12


def test_edge_jump_on_occlusion():
    """A depth discontinuity (near wall -> far wall) marks Edge_Jump near
    the jump (preprocess.cpp:661-695)."""
    cfg = Config(lidar_type=LidarType.AVIA, blind=0.5, point_filter_num=2)
    n = 200
    az = np.deg2rad(np.linspace(-20, 20, n))
    r = np.where(az < 0, 5.0, 12.0)  # occluding edge at az=0
    pts = np.stack([r * np.cos(az), r * np.sin(az), np.zeros(n)], -1)
    (_sp, _si, _stt), corners, ftype = F.give_feature(
        pts, np.zeros(n), np.linspace(0, 0.1, n), cfg
    )
    jump = n // 2
    marked = [i for i in range(n) if ftype[i] == F.EDGE_JUMP]
    assert marked, "no Edge_Jump found at the occlusion"
    assert min(abs(i - jump) for i in marked) <= 3


def test_blind_points_skipped():
    cfg = Config(lidar_type=LidarType.AVIA, blind=5.0, point_filter_num=1)
    pts = np.tile(np.array([[1.0, 1.0, 0.0]]), (50, 1))  # 2D range ~1.41 < 5
    (sp, _si, _stt), corners, ftype = F.give_feature(
        pts, np.zeros(50), np.zeros(50), cfg
    )
    assert len(sp) == 0 and len(corners) == 0


def test_extract_surfaces_avia_msg():
    cfg = Config(
        lidar_type=LidarType.AVIA, n_scans=2, blind=0.5, point_filter_num=2,
        feature_extract_enable=True,
    )
    ring = ring_on_walls(300)
    n = 2 * len(ring)
    msg = {
        "xyz": np.concatenate([ring, ring + [0, 0, 0.3]]),
        "line": np.repeat([0, 1], len(ring)).astype(np.uint8),
        "tag": np.full(n, 0x10, np.uint8),
        "reflectivity": np.ones(n, np.float32),
        "offset_time_ns": np.tile(np.linspace(0, 1e8, len(ring)), 2).astype(np.int64),
    }
    scan = F.extract_surfaces(msg, None, cfg)
    assert len(scan.pts) > 80
    # output sorted by time (the pipeline requires it for deskew)
    assert (np.diff(scan.time_offset_s) >= 0).all()
