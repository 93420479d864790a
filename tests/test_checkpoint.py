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


def test_checkpoint_resume_exact(tmp_path):
    """A resumed pipeline must track the uninterrupted run EXACTLY: the full
    checkpoint carries the local-map cube, sync statistics (mean_scantime),
    IMU init stats and bookkeeping flags (round-1 review: the old partial
    save silently re-centered the cube on resume)."""
    data = simlib.generate(simlib.SimConfig(duration=3.0))
    cfg = make_cfg()

    # uninterrupted reference run over scans 0..28
    ref = Pipeline(cfg)
    s = [0]
    feed(ref, data, 0, 28, s)

    pipe = Pipeline(cfg)
    s = [0]
    feed(pipe, data, 0, 20, s)
    path = tmp_path / "ck.npz"
    ckpt.save_pipeline(path, pipe)

    # resume in a FRESH pipeline
    pipe2 = Pipeline(cfg)
    ckpt.load_pipeline(path, pipe2)

    # restored state must match bit-for-bit
    np.testing.assert_allclose(
        np.asarray(st.boxminus(pipe2.x, pipe.x)), 0.0, atol=1e-7
    )
    assert int(jax.device_get((pipe2.map.packed == pipe.map.packed).all()))
    assert pipe2.sync.mean_scantime == pipe.sync.mean_scantime
    assert pipe2.sync.scan_num == pipe.sync.scan_num
    assert pipe2.first_lidar_time == pipe.first_lidar_time
    lm2, lm1 = pipe2.lm_state, pipe.lm_state
    np.testing.assert_array_equal(np.asarray(lm2[0]), np.asarray(lm1[0]))
    np.testing.assert_array_equal(np.asarray(lm2[1]), np.asarray(lm1[1]))

    # Transport-stream continuity: the checkpoint deliberately carries
    # estimator state only; in-flight sensor queues (tail IMU sample plus any
    # samples buffered past the last scan end) belong to the transport and
    # are handed over by the host — here by adopting the old SyncBuffer.
    pipe2.sync = pipe.sync

    # continue the run: the resumed trajectory must equal the uninterrupted
    # one (identical inputs, identical state -> identical math)
    feed(pipe2, data, 20, 28, s)
    assert len(pipe2.trajectory) == 8
    t_ref = ref.get_trajectory()[-8:]
    t_res = pipe2.get_trajectory()
    for (ta, pa, qa), (tb, pb, qb) in zip(t_ref, t_res):
        assert ta == tb
        np.testing.assert_allclose(pa, pb, atol=1e-6)
    ate = simlib.ate_rmse(pipe.get_trajectory() + pipe2.get_trajectory(), data)
    assert ate < 0.10, f"resumed ATE too large: {ate}"


def test_checkpoint_partial_legacy(tmp_path):
    """Pre-round-2 checkpoints (estimator+map only) still load."""
    data = simlib.generate(simlib.SimConfig(duration=2.0))
    cfg = make_cfg()
    pipe = Pipeline(cfg)
    s = [0]
    feed(pipe, data, 0, 12, s)
    path = tmp_path / "old.npz"
    ckpt.save(path, pipe.x, pipe.P, pipe.map, pipe.imu_carry,
              meta={"acc_scale": pipe.acc_scale})
    pipe2 = Pipeline(cfg)
    ckpt.load_pipeline(path, pipe2)
    assert not pipe2.imu_need_init and pipe2.map_built
    np.testing.assert_allclose(
        np.asarray(st.boxminus(pipe2.x, pipe.x)), 0.0, atol=1e-7)
