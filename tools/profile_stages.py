"""Per-stage device timing at bench shapes, on whatever chip is attached.

Times each sub-op of the fused lio_step in isolation (jitted, block-until-
ready, best-of-K) so PERF.md's stage table can be kept honest.  Run
manually: python tools/profile_stages.py
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/fast_lio_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fast_lio_tpu import imu as imu_mod
from fast_lio_tpu import sim as simlib
from fast_lio_tpu import state as st
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.filter import process
from fast_lio_tpu.map import hash_map as hm
from fast_lio_tpu.ops import measurement as meas
from fast_lio_tpu.ops.voxel_grid import voxel_downsample
from fast_lio_tpu.pipeline import Pipeline


def timeit(name, fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"{name:42s} {best*1e3:8.3f} ms")
    return best


def main():
    cfg = Config(
        lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
        n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=13,
        det_range=40.0, cube_side_length=300.0,
    )
    # build a realistic map + state by running the pipeline a few seconds
    data = simlib.generate(simlib.SimConfig(duration=3.0, n_rings=16,
                                            n_azimuth=400))
    pipe = Pipeline(cfg)
    imu_i = 0
    for k in range(len(data.scans)):
        stamp = data.scan_stamps[k]
        while imu_i < len(data.imu_t) and data.imu_t[imu_i] <= stamp + 0.1 + 1e-9:
            pipe.push_imu(data.imu_t[imu_i], data.imu_acc[imu_i],
                          data.imu_gyr[imu_i])
            imu_i += 1
        pipe.push_lidar(stamp, data.scans[k], data.scan_pt_times[k])
        while pipe.spin_once():
            pass
    jax.block_until_ready(pipe.P)
    print(f"map_size={int(jax.device_get(hm.map_size(pipe.map)))}")

    m, map_cfg, x, P = pipe.map, pipe.map_cfg, pipe.x, pipe.P
    dtype = pipe.dtype
    rng = np.random.default_rng(0)

    # representative inputs
    N, ND, M = cfg.n_points_max, cfg.n_ds_max, cfg.n_imu_max
    scan = data.scans[-1]
    pts = np.zeros((N, 3), np.float32)
    n = min(len(scan), N)
    pts[:n] = scan[:n]
    pt_mask = np.arange(N) < n
    ptt = np.zeros(N, np.float32)
    ptt[:n] = data.scan_pt_times[-1][:n]
    pts, ptt, pt_mask = jnp.asarray(pts), jnp.asarray(ptt), jnp.asarray(pt_mask)

    imu_t = jnp.asarray(np.linspace(0, 0.1, M), dtype)
    imu_acc = jnp.asarray(np.tile([0, 0, 9.81], (M, 1))
                          + rng.normal(size=(M, 3)) * 1e-3, dtype)
    imu_gyr = jnp.asarray(rng.normal(size=(M, 3)) * 1e-2, dtype)
    imu_mask = jnp.ones(M, bool)
    Q = pipe.Q
    carry = pipe.imu_carry

    # stage 1: IMU propagate + deskew
    prop = jax.jit(partial(imu_mod.propagate_and_deskew, deskew=True))
    timeit("imu propagate+deskew", prop, x, P, Q, imu_t, imu_acc, imu_gyr,
           imu_mask, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
           jnp.asarray(0.1, dtype), carry, pts, ptt)

    # stage 2: voxel downsample
    vds = jax.jit(partial(voxel_downsample, leaf=cfg.filter_size_surf,
                          n_out=ND))
    pts_ds, ds_mask = vds(pts, pt_mask)
    timeit("voxel downsample (8192->4096)", vds, pts, pt_mask)

    # stage 3: kNN search
    q = pts_ds + jnp.asarray([5.0, 5.0, 0.5], dtype)  # world-ish offset
    knn = jax.jit(partial(hm.knn_search, m, map_cfg))
    nbrs, sq, found = knn(q)
    timeit("knn_search (4096 q)", knn, q)

    # stage 3b: plane fit
    from fast_lio_tpu.ops.plane_fit import fit_plane
    pf = jax.jit(fit_plane)
    timeit("plane fit (4096x5)", pf, nbrs, found)

    # stage 4: full measurement (search + fit + H assembly)
    cache0 = meas.empty_cache(ND, dtype, 0)
    knn_fn = partial(hm.knn_search, m, map_cfg, return_candidates=False)
    mfun = jax.jit(lambda xx, p, mk: meas.compute_measurement(
        xx, p, mk, knn_fn, cache0, jnp.asarray(True), False, rescore=False))
    timeit("measurement (search+fit+H)", mfun, x, pts_ds, ds_mask)

    # stage 6: map insert
    ins_dec = jax.jit(partial(hm.insert_decisions,
                              voxel=cfg.filter_size_map))
    add_mask, ds_flag = ins_dec(q, ds_mask, nbrs, found, jnp.asarray(True))
    timeit("insert_decisions", ins_dec, q, ds_mask, nbrs, found,
           jnp.asarray(True))
    ins = jax.jit(lambda mm, p, a, d: hm.insert(mm, map_cfg, p, a, d))
    timeit("map insert (4096)", ins, m, q, add_mask, ds_flag)

    # stage 7: prune
    lo = jnp.asarray([-150.0] * 3, dtype)
    hi = jnp.asarray([150.0] * 3, dtype)
    timeit("map prune", jax.jit(hm.prune_outside), m, lo, hi)

    # full fused step for reference
    from fast_lio_tpu.pipeline import lio_step
    step = jax.jit(partial(lio_step, cfg, pipe.map_cfg))
    lm_lo, lm_hi, lm_init = pipe.lm_state
    args = (x, P, m, carry, Q, imu_t, imu_acc, imu_gyr, imu_mask,
            jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype),
            jnp.asarray(0.1, dtype), pts, ptt, pt_mask,
            jnp.zeros_like(ptt), lm_lo, lm_hi,
            lm_init, jnp.asarray(True), jnp.asarray(True))
    timeit("FULL fused lio_step", step, *args, reps=20)


if __name__ == "__main__":
    main()
