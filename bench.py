"""Benchmark: sustained LIO scan rate on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference claims >100 Hz LiDAR-rate processing
(/root/reference/README.md:236-261, README.md:42), so vs_baseline =
scans_per_sec / 100.

Scenarios (``python bench.py [scenario]``, default ``avia`` — the driver's
no-arg invocation is unchanged): the SURVEY §6 sensor envelope.
  avia              ~12.8k pts/scan indoor, 0.3 m voxels (headline)
  ouster64          64-ring ~44k pts/scan indoor, 0.5 m voxels, sparse preset
  mid360            100 Hz small scans (~640 pts), 0.5 m voxels
  velodyne_outdoor  16-ring outdoor 90x90 m hall, sparse remedy on
                    (the proven test_sparse_regime e2e geometry)
  avia_batchN       N independent avia streams through ONE vmapped step
                    (aggregate scans/s; lockstep fleet-replay mode — NOT a
                    throughput mode, see batch.py docstring)

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
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

N_WARM = 6


def _scenario(name):
    """Returns (cfg, sim_data). Configs mirror the proven
    test configurations for each envelope point (tests/test_sparse_regime.py
    for the outdoor one)."""
    import os

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import Config, LidarType

    if name == "avia":
        # Avia-like load: ~12.8k raw points/scan pre-decimation, 0.3 m voxels.
        # Pads sized to keep XLA compile time bounded on the tunnel backend.
        cfg = Config(
            lidar_type=LidarType.AVIA,
            filter_size_surf=0.3,
            filter_size_map=0.3,
            n_points_max=8192,
            n_ds_max=4096,
            n_imu_max=32,
            map_h_log2=13,  # x 64 slots = same 524k capacity as the old 15x16
            det_range=40.0,
            cube_side_length=300.0,
        )
        data = simlib.generate(
            simlib.SimConfig(duration=10.0, n_rings=16, n_azimuth=400)
        )
        return cfg, data
    if name == "ouster64":
        # 64-ring spinning lidar, ~44k rays/scan (SURVEY §6: OS1-64 ≈ 44k
        # pts at 10 Hz after the reference's 1-in-3 decimation of 131k).
        cfg = Config(
            lidar_type=LidarType.OUST64,
            filter_size_surf=0.5,
            filter_size_map=0.5,
            n_points_max=45056,
            n_ds_max=8192,
            n_imu_max=32,
            map_h_log2=13,
            det_range=100.0,
            cube_side_length=300.0,
            map_cell_multiplier=5,
            knn_wide_fallback=True,
        )
        data = simlib.generate(
            simlib.SimConfig(duration=10.0, n_rings=64, n_azimuth=688,
                             elev_min=-22.5, elev_max=22.5)
        )
        return cfg, data
    if name == "mid360":
        # high-rate regime: 100 Hz scans of ~640 pts (the reference's >100 Hz
        # claim is exactly this downsampled-Avia/mid360 mode, README.md:42)
        cfg = Config(
            lidar_type=LidarType.AVIA,
            filter_size_surf=0.5,
            filter_size_map=0.5,
            n_points_max=1024,
            n_ds_max=512,
            n_imu_max=8,
            map_h_log2=12,
            det_range=100.0,
            cube_side_length=300.0,
            map_cell_multiplier=5,
            knn_wide_fallback=True,
            knn_wide_max_queries=128,  # partial-wide at 512-query scans
        )
        data = simlib.generate(
            simlib.SimConfig(duration=10.0, scan_period=0.01, n_rings=8,
                             n_azimuth=80, imu_rate=400.0)
        )
        return cfg, data
    if name == "velodyne_outdoor":
        # the proven outdoor sparse-regime geometry
        # (tests/test_sparse_regime.py::test_outdoor_scale_e2e_with_wide_fallback)
        import numpy as np

        world = simlib.World(
            room_lo=np.array([-40.0, -20.0, 0.0]),
            room_hi=np.array([50.0, 70.0, 12.0]),
            pillars=(
                (np.array([-10.0, 8.0, 0.0]), np.array([-7.0, 11.0, 12.0])),
                (np.array([12.0, 25.0, 0.0]), np.array([15.5, 28.5, 12.0])),
            ),
        )
        cfg = Config(
            lidar_type=LidarType.VELO16,
            filter_size_surf=0.5,
            filter_size_map=0.5,
            n_points_max=8192,
            n_ds_max=4096,
            n_imu_max=32,
            map_h_log2=12,
            det_range=100.0,
            cube_side_length=600.0,
            map_cell_multiplier=5,
            knn_wide_fallback=True,
        )
        data = simlib.generate(
            simlib.SimConfig(duration=10.0, n_rings=16, n_azimuth=320,
                             elev_min=-22.0, elev_max=8.0,
                             max_range=100.0, range_noise=0.01),
            traj=simlib.Trajectory(radius=12.0, omega=0.4),
            world=world,
        )
        return cfg, data
    raise SystemExit(f"unknown scenario {name!r}")


def main_batch(n_streams=4):
    """avia_batchN: N independent avia streams through ONE vmapped step
    (fast_lio_tpu.batch) — lockstep fleet replay, a convenience the reference's
    one-node-per-trajectory architecture cannot express.  Reports AGGREGATE
    scans/s across streams (per-stream latency stays ~1 round)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.batch import BatchPipeline

    cfg, _ = _scenario("avia")
    datas = [
        simlib.generate(simlib.SimConfig(duration=10.0, n_rings=16,
                                         n_azimuth=400, seed=s))
        for s in range(n_streams)
    ]
    bp = BatchPipeline(cfg, n_streams)

    def drain():
        return float(np.asarray(jax.device_get(bp.P))[0, 0, 0])

    imu_i = [0] * n_streams
    n_rounds = max(len(d.scans) for d in datas)

    def feed_round(k):
        for i, d in enumerate(datas):
            if k >= len(d.scans):
                bp.mark_done(i)
                continue
            stamp = d.scan_stamps[k]
            end = stamp + 0.1
            while imu_i[i] < len(d.imu_t) and d.imu_t[imu_i[i]] <= end + 1e-9:
                bp.push_imu(i, d.imu_t[imu_i[i]], d.imu_acc[imu_i[i]],
                            d.imu_gyr[imu_i[i]])
                imu_i[i] += 1
            bp.push_lidar(i, stamp, d.scans[k], d.scan_pt_times[k])

    # warm-up rounds (compiles)
    k = 0
    while k < n_rounds and len(bp.trajectory[0]) < N_WARM:
        feed_round(k)
        while bp.spin_once():
            pass
        k += 1
    drain()

    t0 = time.perf_counter()
    scans0 = sum(len(t) for t in bp.trajectory)
    while k < n_rounds:
        feed_round(k)
        while bp.spin_once():
            pass
        k += 1
    drain()
    wall = time.perf_counter() - t0
    scans = sum(len(t) for t in bp.trajectory) - scans0
    sps = scans / wall

    ates = [simlib.ate_rmse(
        [(t, p, q) for t, p, q in bp.get_trajectory(i)], datas[i])
        for i in range(n_streams)]
    result = {
        "metric": "lio_scan_rate",
        "value": round(sps, 2),
        "unit": "scans/s",
        "vs_baseline": round(sps / 100.0, 3),
        "extra": {
            "scenario": f"avia_batch{n_streams}",
            "aggregate_over_streams": n_streams,
            "ate_rmse_m_per_stream": [round(a, 4) for a in ates],
            "scans": scans,
            "platform": str(jax.devices()[0].platform),
        },
    }
    print(json.dumps(result))


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the big fused step compiles once per shape
    jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.pipeline import Pipeline

    scenario = sys.argv[1] if len(sys.argv) > 1 else "avia"
    if scenario.startswith("avia_batch"):
        return main_batch(int(scenario[len("avia_batch"):] or 4))
    cfg, data = _scenario(scenario)
    if os.environ.get("FAST_LIO_RESCORE") == "1":
        # A/B knob: converged-iteration re-searches re-rank the cached
        # candidate block instead of re-gathering the map (Config.
        # rescore_research docs; labeled in extra.rescore below).  Rescore
        # does not compose with the wide fallback (make_knn_fn raises), so
        # the A/B is only offered where semantics stay identical (ADVICE r4).
        import dataclasses

        if cfg.knn_wide_fallback:
            print(f"FAST_LIO_RESCORE=1 ignored: scenario {scenario!r} uses "
                  "knn_wide_fallback and rescore would change search "
                  "semantics (see make_knn_fn)", file=sys.stderr)
        else:
            cfg = dataclasses.replace(cfg, rescore_research=True)
    pipe = Pipeline(cfg)

    knn_backend = "xla"  # the one production backend (PERF.md "kNN backends")

    # pre-build packets so packet sync never interleaves with timing
    period = (float(data.scan_stamps[1] - data.scan_stamps[0])
              if len(data.scan_stamps) > 1 else 0.1)
    imu_i = 0
    packets = []
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        end = stamp + period
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

    def probe_dispatch_ms(n=40):
        """Chained tiny-op dispatch latency through the tunnel (ms/call).
        The axon tunnel's per-dispatch cost varies 0.25-1.0 ms across hours;
        publishing it with every run makes environment-limited numbers
        distinguishable from code regressions (PERF.md 'tunnel variance')."""
        g = jax.jit(lambda v: v * 1.000001 + 1e-9)
        y = jnp.zeros((8, 8), jnp.float32)
        y = g(y)
        float(np.asarray(jax.device_get(y))[0, 0])
        t0 = time.perf_counter()
        for _ in range(n):
            y = g(y)
        float(np.asarray(jax.device_get(y))[0, 0])
        return (time.perf_counter() - t0) / n * 1e3

    t_start = time.perf_counter()
    # ---- warm-up: compiles + cache loads happen here ----
    for pkt in packets[:N_WARM]:
        pipe.process_packet(pkt)
    drain()
    warm_s = time.perf_counter() - t_start
    tunnel_pre_ms = probe_dispatch_ms()

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
    tunnel_post_ms = probe_dispatch_ms()

    # ---- synced per-scan latency (VERDICT r4 #3) ----
    # Fresh pipeline, same packets, ONE forced readback per scan: the wall
    # time of each scan is the real feed->result-ready latency as seen
    # through this host link.  On axon every readback pays the tunnel RTT
    # (~30-40 ms — production PCIe pays ~10 us), so the RTT is probed
    # back-to-back in the same window and published alongside; the
    # tunnel-corrected percentiles are the hardware's own latency story and
    # carry the real-time budget flags (mid360 p99 < 10 ms, 10 Hz sensors
    # p99 < 100 ms — reference README.md:42 real-time claim).
    # Best-effort when the environment is degraded: a >3 ms dispatch probe
    # or a minutes-long warm (remote compile service backlog) means the
    # synced pass would only measure the outage — keep the primary metric
    # and mark the latency fields skipped (the banked healthy-window runs
    # carry them; PERF.md "tunnel variance").
    lat_skipped = (max(tunnel_pre_ms, tunnel_post_ms) > 3.0
                   or warm_s > 300.0)
    lat = []
    if not lat_skipped:
        pipe2 = Pipeline(cfg)
        for pkt in packets[:N_WARM]:
            pipe2.process_packet(pkt)
        drain2 = lambda: float(np.asarray(jax.device_get(pipe2.P))[0, 0])
        drain2()
        for pkt in packets[N_WARM:N_WARM + 200]:
            t0 = time.perf_counter()
            pipe2.process_packet(pkt)
            drain2()
            lat.append(time.perf_counter() - t0)
    # link probe: one tiny dispatch + readback of a FRESH buffer each time
    # (re-reading the same buffer hits jax's host-side npy cache and
    # measures 0), i.e. the floor any synced call pays on this link; a
    # production PCIe host pays ~20 us for the same round trip
    g2 = jax.jit(lambda v: v * 1.000001 + 1e-9)
    z = jnp.zeros((8, 8), jnp.float32)
    z = g2(z)
    float(np.asarray(jax.device_get(z))[0, 0])
    rtts = []
    for _ in range(20):
        t0 = time.perf_counter()
        z = g2(z)
        float(np.asarray(jax.device_get(z))[0, 0])
        rtts.append(time.perf_counter() - t0)
    rtt_ms = float(np.percentile(np.asarray(rtts), 50)) * 1e3
    rtt_p99_ms = float(np.percentile(np.asarray(rtts), 99)) * 1e3
    budget_ms = 10.0 if scenario == "mid360" else 100.0
    if lat:
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        lat_p50 = float(np.percentile(lat_ms, 50))
        lat_p99 = float(np.percentile(lat_ms, 99))
        lat_c_p50 = max(0.0, lat_p50 - rtt_ms)
        # p99 minus the link's own p99: tail scans on this host are
        # dominated by tunnel stalls (one ~40 ms RTT spike is dozens of
        # scan-times); the budget flag judges the HARDWARE, the raw
        # percentiles judge this host
        lat_c_p99 = max(0.0, lat_p99 - rtt_p99_ms)
        lat_fields = {
            "latency_p50_ms": round(lat_p50, 2),
            "latency_p99_ms": round(lat_p99, 2),
            "latency_rtt_ms": round(rtt_ms, 2),
            "latency_rtt_p99_ms": round(rtt_p99_ms, 2),
            "latency_corrected_p50_ms": round(lat_c_p50, 2),
            "latency_corrected_p99_ms": round(lat_c_p99, 2),
            "latency_budget_ms": budget_ms,
            "latency_budget_ok": bool(lat_c_p99 < budget_ms),
        }
    else:
        lat_fields = {"latency_skipped":
                      "degraded link/compile service (see PERF.md)"}

    deltas_ms = np.sort(np.asarray(deltas)) * 1e3
    # ate_rmse_m is the standard TUM/evo Umeyama-aligned ATE for EVERY
    # scenario (one definition, rows comparable); the raw first-pose-anchored
    # value is always published alongside as ate_rmse_raw_m.
    ate_raw = simlib.ate_rmse(pipe.trajectory, data)
    ate = simlib.ate_rmse_aligned(pipe.trajectory, data)
    result = {
        "metric": "lio_scan_rate",
        "value": round(scans_per_sec, 2),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / 100.0, 3),
        "extra": {
            "scenario": scenario,
            "ate_rmse_m": round(ate, 4),
            "ate_definition": "umeyama_aligned",
            "ate_rmse_raw_m": round(ate_raw, 4),
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
            # EFFECTIVE state (not the env var): rescore is refused on
            # wide-fallback scenarios, see the guard at cfg construction
            "rescore": bool(cfg.rescore_research),
            **lat_fields,
            "tunnel_dispatch_ms": [round(tunnel_pre_ms, 3),
                                   round(tunnel_post_ms, 3)],
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
