"""Oracle-vs-pipeline ATE A/B on the bench scenarios (VERDICT r4 #1).

Runs the SAME simulated scenario through (a) the quirk-faithful f64 NumPy
oracle — the reference's exact math with an unbounded brute-force kNN
(oracle.py; laserMapping.cpp:638-754 is the math being matched) — and
(b) the production TPU pipeline (on CPU here, f32, region-limited search
incl. the wide fallback), and prints both Umeyama-aligned and raw ATE.

This closes the accuracy loop where it is most at risk (sparse outdoor
regime, wide fallback, f32): if the pipeline's ATE is within ~2x of the
oracle's, the gap to ground truth is the FILTER's (the reference would do
no better on this data); a materially worse pipeline number would indict
the TPU search/precision design.

Usage:
    python tools/oracle_ab.py velodyne_outdoor [duration_s]
    python tools/oracle_ab.py avia
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    scenario = sys.argv[1] if len(sys.argv) > 1 else "velodyne_outdoor"
    duration = float(sys.argv[2]) if len(sys.argv) > 2 else None

    import bench
    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.oracle import OracleLIO
    from fast_lio_tpu.pipeline import Pipeline

    cfg, data = bench._scenario(scenario)
    if duration is not None:
        # regenerate the same scenario geometry at a longer duration
        import dataclasses as dc
        if scenario != "velodyne_outdoor":
            raise SystemExit("duration override is wired for the outdoor "
                             "scenario only")
        world = simlib.World(
            room_lo=np.array([-40.0, -20.0, 0.0]),
            room_hi=np.array([50.0, 70.0, 12.0]),
            pillars=(
                (np.array([-10.0, 8.0, 0.0]), np.array([-7.0, 11.0, 12.0])),
                (np.array([12.0, 25.0, 0.0]), np.array([15.5, 28.5, 12.0])),
            ),
        )
        data = simlib.generate(
            simlib.SimConfig(duration=duration, n_rings=16, n_azimuth=320,
                             elev_min=-22.0, elev_max=8.0,
                             max_range=100.0, range_noise=0.01),
            traj=simlib.Trajectory(radius=12.0, omega=0.4),
            world=world,
        )

    # ---- packets (one construction, shared by both runs) ----
    pipe = Pipeline(cfg)
    pkts = []
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        while (imu_i < len(data.imu_t)
               and data.imu_t[imu_i] <= stamp + 0.1 + 1e-9):
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while True:
            p = pipe.sync.pop_packet()
            if p is None:
                break
            pkts.append(p)

    # ---- pipeline run ----
    t0 = time.time()
    for p in pkts:
        pipe.process_packet(p)
    traj_pipe = pipe.get_trajectory()
    t_pipe = time.time() - t0

    # ---- oracle run (reference math, f64, unbounded search) ----
    t0 = time.time()
    orc = OracleLIO(cfg, quirks=True)
    for i, p in enumerate(pkts):
        orc.process_packet(p)
        if i % 20 == 0:
            print(f"  oracle scan {i}/{len(pkts)} "
                  f"(map {orc.map.size()})", file=sys.stderr)
    traj_orc = [(t, p, q) for t, p, q in orc.trajectory]
    t_orc = time.time() - t0

    out = {
        "scenario": scenario,
        "scans": len(pkts),
        "duration_s": duration or float(data.scan_stamps[-1]
                                        - data.scan_stamps[0] + 0.1),
        "pipeline": {
            "ate_aligned_m": round(simlib.ate_rmse_aligned(traj_pipe, data), 4),
            "ate_raw_m": round(simlib.ate_rmse(traj_pipe, data), 4),
            "wall_s": round(t_pipe, 1),
        },
        "oracle_quirks_f64": {
            "ate_aligned_m": round(simlib.ate_rmse_aligned(traj_orc, data), 4),
            "ate_raw_m": round(simlib.ate_rmse(traj_orc, data), 4),
            "wall_s": round(t_orc, 1),
            "map_size": int(orc.map.size()),
        },
    }
    out["ratio_aligned"] = round(
        out["pipeline"]["ate_aligned_m"]
        / max(out["oracle_quirks_f64"]["ate_aligned_m"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
