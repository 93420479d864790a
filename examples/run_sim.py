"""End-to-end demo: synthetic world -> full LIO pipeline -> ATE report.

Usage:  python examples/run_sim.py [--duration 6] [--platform cpu|axon]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=float, default=6.0)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import MARSIM, Config, LidarType
    from fast_lio_tpu.pipeline import Pipeline

    cfg = Config(
        lidar_type=LidarType.AVIA,  # full deskew path
        filter_size_surf=0.3,
        filter_size_map=0.3,
        n_points_max=8192,
        n_ds_max=4096,
        n_imu_max=32,
        map_h_log2=15,
        det_range=40.0,
        cube_side_length=300.0,
    )
    data = simlib.generate(
        simlib.SimConfig(duration=args.duration, range_noise=args.noise)
    )
    pipe = Pipeline(cfg)

    imu_i = 0
    t_start = time.perf_counter()
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        end = stamp + 0.1
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= end + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i], data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while pipe.spin_once():
            pass
        if not args.quiet and pipe.trajectory:
            t, p, q = pipe.trajectory[-1]
            gt = data.gt_pos[k] - data.gt_pos[0] + np.array([0, 0, 1.0]) * 0
            print(f"scan {k:3d} t={t:6.2f} pos=({p[0]:+7.3f},{p[1]:+7.3f},{p[2]:+7.3f})")

    wall = time.perf_counter() - t_start
    ate = simlib.ate_rmse(pipe.trajectory, data)
    n = len(pipe.trajectory)
    print(f"\nprocessed {n} scans in {wall:.2f}s ({n / wall:.1f} scans/s)")
    print(f"ATE RMSE: {ate * 100:.2f} cm")
    if pipe.diags:
        d = pipe.diags[-1]
        print(f"last scan: n_down={d.n_down} n_eff={d.n_effective} "
              f"iters={d.iterations} map={d.map_size}")
    return ate


if __name__ == "__main__":
    ate = main()
    sys.exit(0 if ate < 0.30 else 1)
