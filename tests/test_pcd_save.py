"""--pcd-save semantics: accumulated DENSE world-frame scans, chunked by
pcd_save_interval (laserMapping.cpp:504-529,1024-1031) — NOT the voxel map
(VERDICT r3 item 5).  Replays a sim world through the CLI and checks the
PCD point counts equal the sum of dense scan sizes."""
import numpy as np

from fast_lio_tpu import cli
from fast_lio_tpu.utils.checkpoint import load_pcd


def test_pcd_save_accumulates_dense_scans(tmp_path):
    rc = cli.main([
        "--sim", "--duration", "2.0", "--out", str(tmp_path),
        "--pcd-save", "--pcd-save-interval", "5", "--map-save",
    ])
    assert rc == 0

    chunks = sorted(tmp_path.glob("scans_*.pcd"))
    final = tmp_path / "scans.pcd"
    assert chunks, "interval chunking produced no scans_<i>.pcd"

    total = sum(len(load_pcd(p)) for p in chunks)
    if final.exists():
        total += len(load_pcd(final))

    # expected: every processed scan contributes its full dense deskewed
    # cloud (the IMU-init packets contribute nothing)
    traj = np.loadtxt(tmp_path / "trajectory_tum.txt")
    n_scans = len(traj)
    csv = [r for r in (tmp_path / "fast_lio_time_log.csv").read_text()
           .strip().splitlines() if not r.startswith("#")]
    sizes = [int(float(r.split(",")[2])) for r in csv[1:]]  # scan_point_size
    assert len(sizes) == n_scans
    assert total == sum(sizes)

    # dense accumulation is strictly bigger than the downsampled map export
    map_pts = load_pcd(tmp_path / "map.pcd")
    assert total > len(map_pts) > 0

    # chunk sizes: every full chunk holds exactly 5 scans' dense points
    sizes_iter = iter(sizes)
    for c in chunks:
        expect = sum(next(sizes_iter) for _ in range(5))
        assert len(load_pcd(c)) == expect
