"""Stage-timing CSV truthfulness (VERDICT r3 item 6 'Done' criterion):
the search column must time the CONFIGURED backend incl. the wide
fallback, and every stage column must be a real positive device timing."""
import numpy as np

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import Pipeline


def _run(cfg, duration=1.5):
    data = simlib.generate(simlib.SimConfig(duration=duration, n_rings=8,
                                            n_azimuth=100))
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


def test_stage_times_positive_with_wide_fallback():
    # a sparse-style config: wide fallback ON — exactly where a bare
    # hm.knn_search timer would misstate the search cost
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=1024, n_ds_max=512, n_imu_max=32, map_h_log2=11,
        det_range=40.0, cube_side_length=300.0,
        map_cell_multiplier=5, knn_wide_fallback=True, stage_timing=True,
    )
    pipe = _run(cfg)
    st = pipe.measure_stage_times()
    assert set(st) == {"search", "incremental", "delete"}
    for k, v in st.items():
        assert v > 0, (k, v)
    # stage_timing mode records real synced per-scan latency
    assert all(d.total_time > 0 for d in pipe.diags)
