"""Candidate-rescoring re-search mode: accuracy parity with full re-search."""
import numpy as np

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import Pipeline


def run(rescore):
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=14,
        det_range=40.0, cube_side_length=300.0, rescore_research=rescore,
    )
    data = simlib.generate(simlib.SimConfig(duration=2.5))
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
    return simlib.ate_rmse(pipe.trajectory, data), pipe


def test_rescore_matches_full_research():
    ate_full, p1 = run(False)
    ate_rescore, p2 = run(True)
    assert ate_rescore < 0.05, f"rescore ATE {ate_rescore * 100:.1f} cm"
    # same accuracy class as the faithful mode
    assert abs(ate_rescore - ate_full) < 0.01
    assert abs(int(p1.diags[-1].n_effective) -
               int(p2.diags[-1].n_effective)) < 0.02 * int(
        p1.diags[-1].n_effective)


def test_rescore_refuses_wide_fallback():
    """ADVICE r4: rescore re-ranks the cached 2x2x2 candidate block only; a
    silent combination with the wide 3x3x3 fallback would change search
    semantics mid-A/B.  make_knn_fn must refuse it loudly."""
    import dataclasses

    import pytest

    from fast_lio_tpu.config import Config, LidarType
    from fast_lio_tpu.map import hash_map as hm
    from fast_lio_tpu.pipeline import make_knn_fn

    cfg = Config(lidar_type=LidarType.AVIA, rescore_research=True,
                 knn_wide_fallback=True)
    mcfg = hm.make_config(0.5)
    with pytest.raises(ValueError, match="wide"):
        make_knn_fn(cfg, mcfg, hm.make_map(mcfg))
