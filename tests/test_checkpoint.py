"""Checkpoint/resume: estimator + map state survives a save/load cycle and
the pipeline continues cleanly — the capability the reference lacks
(SURVEY.md §5)."""
import numpy as np

import jax

from fast_lio_tpu import sim as simlib
from fast_lio_tpu import state as st
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.pipeline import Pipeline
from fast_lio_tpu.utils import checkpoint as ckpt


def make_cfg():
    return Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=14,
        det_range=40.0, cube_side_length=300.0,
    )


def feed(pipe, data, k_from, k_to, imu_state):
    imu_i = imu_state[0]
    for k in range(k_from, k_to):
        stamp = data.scan_stamps[k]
        end = stamp + 0.1
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= end + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while pipe.spin_once():
            pass
    imu_state[0] = imu_i


def test_checkpoint_resume(tmp_path):
    data = simlib.generate(simlib.SimConfig(duration=3.0))
    cfg = make_cfg()

    pipe = Pipeline(cfg)
    s = [0]
    feed(pipe, data, 0, 20, s)
    path = tmp_path / "ck.npz"
    ckpt.save(path, pipe.x, pipe.P, pipe.map, pipe.imu_carry,
              meta={"acc_scale": pipe.acc_scale,
                    "last_end": pipe.last_lidar_end_time})

    # resume in a FRESH pipeline
    pipe2 = Pipeline(cfg)
    x, P, m, carry, meta = ckpt.load(path, pipe2.dtype)
    pipe2.x, pipe2.P, pipe2.map, pipe2.imu_carry = x, P, m, carry
    pipe2.imu_need_init = False
    pipe2.map_built = True
    pipe2.acc_scale = float(meta["acc_scale"])
    pipe2.last_lidar_end_time = float(meta["last_end"])
    pipe2.first_lidar_time = 0.0
    # IMU stream continuity: hand over the tail sample
    pipe2.sync.last_imu = pipe.sync.last_imu

    # restored state must match bit-for-bit
    np.testing.assert_allclose(
        np.asarray(st.boxminus(pipe2.x, pipe.x)), 0.0, atol=1e-7
    )
    assert int(jax.device_get((pipe2.map.packed == pipe.map.packed).all()))

    # continue the run
    feed(pipe2, data, 20, 28, s)
    assert len(pipe2.trajectory) == 8
    ate = simlib.ate_rmse(pipe.get_trajectory() + pipe2.get_trajectory(), data)
    assert ate < 0.10, f"resumed ATE too large: {ate}"
