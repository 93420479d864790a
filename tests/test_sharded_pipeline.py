"""End-to-end Pipeline(mesh=...) on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.parallel.sharding import AXIS
from fast_lio_tpu.pipeline import Pipeline


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pipeline_e2e():
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=14,
        map_bucket_slots=32, det_range=40.0, cube_side_length=300.0,
    )
    mesh = Mesh(np.asarray(jax.devices()[:8]), (AXIS,))
    data = simlib.generate(simlib.SimConfig(duration=2.5))
    pipe = Pipeline(cfg, mesh=mesh)
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
    ate = simlib.ate_rmse(pipe.trajectory, data)
    assert ate < 0.06, f"sharded pipeline ATE {ate * 100:.1f} cm"
    assert int(pipe.diags[-1].n_effective) > 500
    # the map really is sharded: each device holds a distinct shard
    assert len(pipe.map.packed.sharding.device_set) == 8
