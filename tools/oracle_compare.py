"""Run the TPU pipeline and the f64 oracle over the same sim; report
per-scan pose deltas.  Used to set the tolerances in
tests/test_oracle_trace.py honestly (measured x2 margin).
Run manually: python tools/oracle_compare.py [n_scans]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from fast_lio_tpu import sim as simlib
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.oracle import OracleLIO, quat_to_mat
from fast_lio_tpu.pipeline import Pipeline


def packets_of(data, cfg):
    pipe = Pipeline(cfg)
    out = []
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        end = stamp + 0.1
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= end + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while True:
            p = pipe.sync.pop_packet()
            if p is None:
                break
            out.append(p)
    return out


def main(n_scans=40):
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=13,
        det_range=40.0, cube_side_length=300.0, knn_backend="xla",
    )
    data = simlib.generate(simlib.SimConfig(
        duration=n_scans * 0.1 + 0.3, n_rings=16, n_azimuth=400,
        range_noise=0.02, imu_acc_noise=0.02, imu_gyr_noise=0.002,
        imu_acc_bias=(0.05, -0.03, 0.02), imu_gyr_bias=(0.004, -0.002, 0.003),
    ))
    pkts = packets_of(data, cfg)

    pipe = Pipeline(cfg)
    t0 = time.time()
    for p in pkts:
        pipe.process_packet(p)
    traj_pipe = pipe.get_trajectory()
    print(f"pipeline: {len(traj_pipe)} poses in {time.time()-t0:.1f}s "
          f"ate={simlib.ate_rmse(pipe.trajectory, data)*100:.2f}cm")

    results = {}
    for name, kw in (
        ("intended", dict(quirks=False, plane_fit="orthogonal")),
        ("reference", dict(quirks=True)),
    ):
        orc = OracleLIO(cfg, **kw)
        t0 = time.time()
        for p in pkts:
            orc.process_packet(p)
        results[name] = orc.trajectory
        ate = simlib.ate_rmse(
            [(t, pos, q) for t, pos, q in orc.trajectory], data)
        print(f"oracle[{name}]: {len(orc.trajectory)} poses in "
              f"{time.time()-t0:.1f}s ate={ate*100:.2f}cm")

    for name, traj_o in results.items():
        n = min(len(traj_pipe), len(traj_o))
        dp, dr = [], []
        for (t1, p1, q1), (t2, p2, q2) in zip(traj_pipe[-n:], traj_o[-n:]):
            dp.append(np.linalg.norm(p1 - p2))
            R1, R2 = quat_to_mat(q1 / np.linalg.norm(q1)), quat_to_mat(q2)
            c = (np.trace(R1.T @ R2) - 1) / 2
            dr.append(np.arccos(np.clip(c, -1, 1)))
        dp, dr = np.asarray(dp), np.asarray(dr)
        print(f"pipe vs oracle[{name}]: pos max {dp.max()*1000:.3f} mm "
              f"p50 {np.median(dp)*1000:.3f} mm | rot max {dr.max()*1e3:.3f} "
              f"mrad p50 {np.median(dr)*1e3:.3f} mrad")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 40)
