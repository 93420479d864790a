"""Benchmark: sustained LIO scan rate on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims >100 Hz LiDAR-rate processing
(/root/reference/README.md:236-261, README.md:42), so vs_baseline =
scans_per_sec / 100.

Measurement discipline (round 2):
  * REAL synchronization — jax.block_until_ready does NOT block on the axon
    tunnel backend (verified: an 8192^3 matmul "finishes" in 26 us under it
    but takes 6.7 ms with a forced readback).  Every drain here materializes
    a scalar that data-depends on the final step's covariance, which cannot
    resolve until every dispatched scan has executed;
  * deterministic warm-up — the first N_WARM scans are processed and the
    device drained before the clock starts, so compiles (fresh or from the
    persistent cache) never leak into the measurement;
  * the measured scans are split into two independent halves, each timed
    with its own device drain; the reported value is the full-span
    throughput and the two halves are published in "extra" so run-to-run
    and intra-run variance (tunnel stalls, rebalances) are visible;
  * per-scan host dispatch deltas are recorded and their p50/p99 published —
    if p99 >> p50 the host stalled (GC, tunnel), not the device.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_WARM = 6


def main():
    import jax

    # persistent compile cache: the big fused step compiles once per shape
    jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import Config, LidarType
    from fast_lio_tpu.pipeline import Pipeline

    import os

    # Avia-like load: ~12.8k raw points/scan pre-decimation, 0.3 m voxels.
    # Pads sized to keep XLA compile time bounded on the tunnel backend.
    cfg = Config(
        lidar_type=LidarType.AVIA,
        filter_size_surf=0.3,
        filter_size_map=0.3,
        n_points_max=8192,
        n_ds_max=4096,
        n_imu_max=32,
        map_h_log2=13,  # x 64 slots = same 524k capacity as the old 15 x 16
        det_range=40.0,
        cube_side_length=300.0,
        knn_backend=os.environ.get("FAST_LIO_KNN", "auto"),
    )
    duration = 10.0
    data = simlib.generate(
        simlib.SimConfig(duration=duration, n_rings=16, n_azimuth=400)
    )
    pipe = Pipeline(cfg)

    from fast_lio_tpu.pipeline import use_pallas_knn

    knn_backend = ("pallas" if use_pallas_knn(cfg, pipe.map_cfg) else "xla")

    # pre-build packets so packet sync never interleaves with timing
    imu_i = 0
    packets = []
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        end = stamp + 0.1
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= end + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i], data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while True:
            pkt = pipe.sync.pop_packet()
            if pkt is None:
                break
            packets.append(pkt)

    def drain():
        # forced host readback: the ONLY real synchronization on axon
        return float(np.asarray(jax.device_get(pipe.P))[0, 0])

    t_start = time.perf_counter()
    # ---- warm-up: compiles + cache loads happen here ----
    for pkt in packets[:N_WARM]:
        pipe.process_packet(pkt)
    drain()
    warm_s = time.perf_counter() - t_start

    # ---- measured run, two independent halves ----
    meas = packets[N_WARM:]
    half = len(meas) // 2
    deltas = []
    halves = []
    t_meas0 = time.perf_counter()
    for part in (meas[:half], meas[half:]):
        t0 = time.perf_counter()
        prev = t0
        for pkt in part:
            pipe.process_packet(pkt)
            now = time.perf_counter()
            deltas.append(now - prev)
            prev = now
        drain()
        halves.append(len(part) / (time.perf_counter() - t0))
    wall = time.perf_counter() - t_meas0
    scans_per_sec = len(meas) / wall

    deltas_ms = np.sort(np.asarray(deltas)) * 1e3
    ate = simlib.ate_rmse(pipe.trajectory, data)
    result = {
        "metric": "lio_scan_rate",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 100.0, 3),
        "extra": {
            "ate_rmse_m": round(ate, 4),
            "scans": len(meas),
            "half1_scans_per_sec": round(halves[0], 2),
            "half2_scans_per_sec": round(halves[1], 2),
            "host_delta_p50_ms": round(float(deltas_ms[len(deltas_ms) // 2]), 3),
            "host_delta_p99_ms": round(
                float(deltas_ms[min(len(deltas_ms) - 1, int(len(deltas_ms) * 0.99))]), 3
            ),
            "warm_s": round(warm_s, 1),
            "n_eff_last": int(pipe.diags[-1].n_effective) if pipe.diags else 0,
            "map_size": int(pipe.diags[-1].map_size) if pipe.diags else 0,
            "platform": str(jax.devices()[0].platform),
            "knn_backend": knn_backend,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
