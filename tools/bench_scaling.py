"""Sharding overhead + scaling measurement (VERDICT r4 item 4).

Two questions the single-chip environment CAN answer about the multi-chip
path (SURVEY §2.8; BASELINE "near-linear >= 2 hosts"):

  1. the INTERCEPT — what does running the identical workload under
     shard_map + collective lowering cost at n=1?  Run on the real chip:
         python tools/bench_scaling.py            # unsharded vs mesh(1)
  2. the TREND — how does throughput move 1 -> 2 -> 4 -> 8 devices on the
     virtual CPU mesh (same code path the distributed tests prove exact)?
         JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
             python tools/bench_scaling.py --trend

Prints one JSON line per configuration:
  {"mode": "unsharded"|"sharded", "n_devices": N, "scans_per_sec": ...}

Methodology matches bench.py: deterministic warm-up, forced host readback
drain (block_until_ready does not block on the tunnel backend).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

N_WARM = 6


def build(cfg_kw=None, small=False):
    from fast_lio_tpu import sim as simlib
    from fast_lio_tpu.config import Config, LidarType

    kw = dict(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=13,
        det_range=40.0, cube_side_length=300.0,
    )
    if small:
        # CPU-trend shapes: 8 virtual devices share one socket; bench-size
        # steps under that contention trip XLA's 40 s collective rendezvous
        # abort (measured), so the trend uses light scans
        kw.update(n_points_max=2048, n_ds_max=1024, map_h_log2=12)
    kw.update(cfg_kw or {})
    cfg = Config(**kw)
    data = simlib.generate(simlib.SimConfig(
        duration=4.0 if small else 10.0, n_rings=16,
        n_azimuth=100 if small else 400))
    return cfg, data


def packets_for(pipe, data):
    imu_i = 0
    pkts = []
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
            pkts.append(p)
    return pkts


def run_one(mode, n_devices, cfg_kw=None, small=False):
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from fast_lio_tpu.parallel.sharding import AXIS
    from fast_lio_tpu.pipeline import Pipeline

    cfg, data = build(cfg_kw, small=small)
    mesh = None
    if mode == "sharded":
        mesh = Mesh(np.asarray(jax.devices()[:n_devices]), (AXIS,))
    pipe = Pipeline(cfg, mesh=mesh)
    pkts = packets_for(pipe, data)

    def drain():
        return float(np.asarray(jax.device_get(pipe.P))[0, 0])

    for p in pkts[:N_WARM]:
        pipe.process_packet(p)
    drain()
    meas = pkts[N_WARM:]
    t0 = time.perf_counter()
    for p in meas:
        pipe.process_packet(p)
    drain()
    sps = len(meas) / (time.perf_counter() - t0)
    print(json.dumps({
        "mode": mode, "n_devices": n_devices,
        "scans_per_sec": round(sps, 2),
        "platform": str(jax.devices()[0].platform),
    }), flush=True)
    return sps


def main():
    import os

    import jax

    if "--cpu" in sys.argv or "--trend" in sys.argv:
        # this machine pins JAX_PLATFORMS=axon via sitecustomize; the env var
        # is not honored, so force CPU in-process for the trend run
        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fast_lio_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if "--trend" in sys.argv:
        # virtual-device scaling; map shards shrink with n (fixed global
        # capacity), so per-device kNN/insert work drops proportionally
        run_one("unsharded", 1, small=True)
        for n in (1, 2, 4, 8):
            if n > len(jax.devices()):
                break
            run_one("sharded", n, small=True)
    elif "--ablate" in sys.argv:
        # n=1 intercept ATTRIBUTION (VERDICT r4 #7): each ablation removes
        # ONE sharded-only cost while staying exact on a 1-device mesh.
        # Sequential runs are swamped by tunnel drift (a first attempt
        # measured intercepts < 1 because the baseline caught a bad
        # window), so all five variants are built once and then timed in
        # INTERLEAVED rounds; per-variant best-of-rounds cancels the drift.
        import numpy as np

        import jax

        from fast_lio_tpu.parallel import sharding
        from fast_lio_tpu.pipeline import Pipeline
        from jax.sharding import Mesh

        from fast_lio_tpu.parallel.sharding import AXIS

        variants = (
            ("unsharded", None, None),
            ("sharded_full", False, False),
            ("sharded_no_merge", True, False),
            ("sharded_no_psum", False, True),
            ("sharded_no_both", True, True),
        )
        cfg, data = build()
        packets = None

        def make_pipe(label, no_merge, no_psum):
            # a FRESH pipeline per timed pass: packet replay on a stateful
            # pipeline would rewind time (negative dt propagation) and the
            # resulting dynamics could skew GN iteration counts.  Ablation
            # flags must be live while the step TRACES (first packet).
            nonlocal packets
            mesh = (None if label == "unsharded" else
                    Mesh(np.asarray(jax.devices()[:1]), (AXIS,)))
            if no_merge is not None:
                sharding.ABLATE_NO_MERGE = no_merge
                sharding.ABLATE_NO_PSUM = no_psum
            pipe = Pipeline(cfg, mesh=mesh)
            if packets is None:
                packets = packets_for(pipe, data)
            for p in packets[:N_WARM]:
                pipe.process_packet(p)
            float(np.asarray(jax.device_get(pipe.P))[0, 0])
            sharding.ABLATE_NO_MERGE = sharding.ABLATE_NO_PSUM = False
            return pipe

        # compile everything once up front (persistent cache + first trace)
        for label, nm, np_ in variants:
            make_pipe(label, nm, np_)

        best = {label: 0.0 for label, *_ in variants}
        for rnd in range(3):
            for label, nm, np_ in variants:
                pipe = make_pipe(label, nm, np_)
                meas = packets[N_WARM:]
                t0 = time.perf_counter()
                for p in meas:
                    pipe.process_packet(p)
                float(np.asarray(jax.device_get(pipe.P))[0, 0])
                sps = len(meas) / (time.perf_counter() - t0)
                best[label] = max(best[label], sps)
                print(json.dumps({"round": rnd, "mode": label,
                                  "scans_per_sec": round(sps, 2)}),
                      flush=True)
        base = best["unsharded"]
        print(json.dumps({
            "best_of_rounds": {k: round(v, 2) for k, v in best.items()},
            "intercept_full": round(base / best["sharded_full"], 3),
            "intercept_no_merge": round(base / best["sharded_no_merge"], 3),
            "intercept_no_psum": round(base / best["sharded_no_psum"], 3),
            "intercept_no_both": round(base / best["sharded_no_both"], 3),
            "note": "each ablation removes one sharded-only cost (exact at "
                    "n=1); the residual of no_both is shard_map lowering + "
                    "donation behavior itself",
        }), flush=True)
    else:
        base = run_one("unsharded", 1)
        one = run_one("sharded", 1)
        print(json.dumps({
            "intercept": round(base / one, 3),
            "note": "unsharded/sharded(1) throughput ratio: shard_map + "
                    "collective lowering overhead at n=1",
        }), flush=True)


if __name__ == "__main__":
    main()
