"""Per-stage device timings with REAL synchronization (slope method).

jax.block_until_ready does not block on the axon backend, so each stage is
timed by looping it N times inside one jit and forcing a host readback; the
reported number is the slope between two loop lengths (cancels the ~37 ms
tunnel RTT).

Shapes come from the bench scenarios: ``python tools/profile_stages.py
[avia|ouster64|mid360|velodyne_outdoor]`` (default avia) — so the stage
table in PERF.md can be produced for any envelope point.  The kNN stage is
built via pipeline.make_knn_fn, so it times the CONFIGURED backend including
the wide-3x3x3 fallback on the sparse presets (round-3 review item).
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

import bench as benchmod
from fast_lio_tpu import imu as imu_mod
from fast_lio_tpu import state as st
from fast_lio_tpu.filter import ekf, process
from fast_lio_tpu.map import hash_map as hm
from fast_lio_tpu.ops import measurement as meas
from fast_lio_tpu.ops.voxel_grid import voxel_downsample
from fast_lio_tpu.pipeline import make_knn_fn

N_LO, N_HI = 8, 72

scenario = sys.argv[1] if len(sys.argv) > 1 else "avia"
cfg, _data = benchmod._scenario(scenario)
map_cfg = hm.make_config(
    voxel_size=cfg.filter_size_map, h_log2=cfg.map_h_log2,
    bucket_slots=cfg.map_bucket_slots, cell_multiplier=cfg.map_cell_multiplier,
)
rng = np.random.default_rng(0)
DT = jnp.float32

# a populated map + scan-like data at the scenario's shapes
mpts = rng.uniform(-20, 20, size=(120000, 3)).astype(np.float32)
m = hm.make_map(map_cfg, DT)
m = hm.insert(m, map_cfg, jnp.asarray(mpts), jnp.ones(len(mpts), bool),
              jnp.zeros(len(mpts), bool))
N_RAW, N_DS, N_IMU = cfg.n_points_max, cfg.n_ds_max, cfg.n_imu_max
pts_raw = jnp.asarray(rng.uniform(-15, 15, size=(N_RAW, 3)), DT)
pt_mask = jnp.arange(N_RAW) < int(N_RAW * 0.78)
pt_time = jnp.asarray(np.sort(rng.uniform(0, 0.1, N_RAW)), DT)
pts_ds = jnp.asarray(rng.uniform(-15, 15, size=(N_DS, 3)), DT)
ds_mask = jnp.arange(N_DS) < int(N_DS * 0.63)
x0 = st.identity_state(DT)
P0 = jnp.eye(st.DOF, dtype=DT)
Q = process.process_noise_cov(0.1, 0.1, 1e-4, 1e-4, DT)
carry0 = imu_mod.init_imu_carry(DT)
imu_t = jnp.asarray(np.linspace(0, 0.1, N_IMU), DT)
imu_acc = jnp.asarray(rng.normal(0, 0.1, (N_IMU, 3)) + [0, 0, 9.81], DT)
imu_gyr = jnp.asarray(rng.normal(0, 0.05, (N_IMU, 3)), DT)
imu_mask = jnp.ones(N_IMU, bool)

knn_fn = make_knn_fn(cfg, map_cfg, m)  # configured backend + wide fallback


def slope(name, fn, *args):
    """Slope with INTERLEAVED lo/hi repeats: the tunnel's throughput drifts
    on ~minute scales, and measuring all lo runs then all hi runs folds that
    drift straight into the slope (observed as negative stage costs under a
    degraded tunnel, r4).  Alternating lo/hi and taking the min of each
    cancels drift; min-filtering drops sporadic RTT stall spikes."""
    fns = {n: jax.jit(partial(fn, n)) for n in (N_LO, N_HI)}
    t = {N_LO: np.inf, N_HI: np.inf}
    for n, f in fns.items():  # compile + first-run warm
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    for _ in range(6):
        for n, f in fns.items():
            t0 = time.perf_counter()
            out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            t[n] = min(t[n], time.perf_counter() - t0)
    per = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    print(f"{name:46s} {per*1e3:8.3f} ms/iter")
    return per


def loop(body, n, init):
    return jax.lax.fori_loop(0, n, body, init)


def f_imu(n, x, P, carry):
    def body(i, s):
        x, P, c, acc = s
        x2, P2, pts_d, c2 = imu_mod.propagate_and_deskew(
            x, P, Q, imu_t, imu_acc, imu_gyr + acc * 1e-12, imu_mask, 1.0,
            jnp.asarray(-0.005, DT), jnp.asarray(0.1, DT), c,
            pts_raw, pt_time, deskew=True,
        )
        # consume EVERY output (x2/P2/deskewed cloud) — an earlier version
        # kept only c2 and XLA dead-code-eliminated the propagation and the
        # whole 8192-pt deskew, reporting ~0 for this stage (r4 fix); x,P
        # stay fixed so the loop doesn't diverge
        acc = acc + x2.pos.sum() + P2.sum() * 1e-9 + pts_d.sum() * 1e-9
        return (x, P, c2, acc)
    return loop(body, n, (x, P, carry, jnp.asarray(0.0, DT)))


def f_downsample(n, pts, mask):
    def body(i, acc):
        c, om = voxel_downsample(pts + acc * 1e-12, mask, cfg.filter_size_surf,
                                 N_DS,
                                 coord_bound=cfg.det_range * 1.25 + 5.0)
        return acc + c.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_knn(n, m, q):
    def body(i, acc):
        nb, sq, fo = knn_fn(q + acc * 1e-12, ds_mask)
        return acc + sq.sum() + nb.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_measurement(n, m, x):
    cache0 = meas.empty_cache(N_DS, DT)
    def body(i, acc):
        h_x, h, sel, cache, valid, _pw = meas.compute_measurement(
            x._replace(pos=x.pos + acc * 1e-12), pts_ds, ds_mask, knn_fn,
            cache0, jnp.asarray(True), True,
        )
        return acc + h_x.sum() + h.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_update(n, m, x, P):
    cache0 = meas.empty_cache(N_DS, DT)
    def h_fn(x_i, converge, cache):
        h_x, h, sel, cache, valid, _pw = meas.compute_measurement(
            x_i, pts_ds, ds_mask, knn_fn, cache, converge, True)
        return ekf.MeasOut(h_x, h, sel, valid, cache)
    def body(i, acc):
        res = ekf.update_iterated(
            x._replace(pos=x.pos + acc * 1e-12), P, h_fn, cache0,
            cfg.laser_point_cov, cfg.max_iteration, cfg.epsi)
        return acc + res.x.pos.sum()
    return loop(body, n, (jnp.asarray(0.0, DT)))


def f_insert(n, m):
    def body(i, carry):
        mm, acc = carry
        # perturb the points per iteration: insert's two argsorts key on
        # pts-derived values only, so constant inputs get HOISTED out of the
        # loop and the row reads as ~0.06 ms instead of the true ~0.5 ms
        # (r4 fix; cross-checked against the ablation bracket in PERF.md)
        p = pts_ds + acc * 1e-12
        add, dsf = hm.insert_decisions(
            p, ds_mask, jnp.zeros((N_DS, 5, 3), DT),
            jnp.zeros((N_DS, 5), bool), jnp.asarray(True),
            cfg.filter_size_map)
        mm = hm.insert(mm, map_cfg, p, add, dsf)
        return (mm, acc + jnp.sum(mm.packed[0, :1]))
    return loop(body, n, (m, jnp.asarray(0.0, DT)))[0]


def f_prune(n, m):
    def body(i, mm):
        return hm.prune_outside(mm, jnp.asarray([-150.0, -150, -150], DT),
                                jnp.asarray([150.0, 150, 150], DT))
    return loop(body, n, m)


if __name__ == "__main__":
    print(f"scenario={scenario}  pads: raw={N_RAW} ds={N_DS} imu={N_IMU}  "
          f"knn wide_fallback={cfg.knn_wide_fallback}")
    total = 0.0
    total += slope(f"imu propagate+deskew ({N_IMU} knots, {N_RAW} pts)",
                   f_imu, x0, P0, carry0)
    total += slope(f"voxel downsample ({N_RAW} -> {N_DS})",
                   f_downsample, pts_raw, pt_mask)
    slope(f"knn search ({N_DS} q, configured backend)", f_knn, m, pts_ds)
    slope("measurement (knn+fit+H, 1 eval)", f_measurement, m, x0)
    total += slope("full iterated update (3 iters)", f_update, m, x0, P0)
    total += slope(f"map insert ({N_DS})", f_insert, m)
    slope("map prune (gated, rarely fires)", f_prune, m)
    print(f"{'device-bound total (imu+ds+update+insert)':46s} {total*1e3:8.3f} ms")
