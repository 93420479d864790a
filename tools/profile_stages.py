"""Per-stage device timings with REAL synchronization (slope method).

jax.block_until_ready does not block on the axon backend, so each stage is
timed by looping it N times inside one jit and forcing a host readback; the
reported number is the slope between two loop lengths (cancels the ~37 ms
tunnel RTT).  Shapes match bench.py.
Run manually: python tools/profile_stages.py
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
from fast_lio_tpu import state as st
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.filter import ekf, process
from fast_lio_tpu.map import hash_map as hm
from fast_lio_tpu.ops import measurement as meas
from fast_lio_tpu.ops.voxel_grid import voxel_downsample

N_LO, N_HI = 4, 24

cfg = Config(
    lidar_type=LidarType.AVIA, filter_size_surf=0.3, filter_size_map=0.3,
    n_points_max=8192, n_ds_max=4096, n_imu_max=32, map_h_log2=13,
    det_range=40.0, cube_side_length=300.0,
)
map_cfg = hm.make_config(voxel_size=cfg.filter_size_map, h_log2=cfg.map_h_log2,
                         bucket_slots=cfg.map_bucket_slots)
rng = np.random.default_rng(0)
DT = jnp.float32

# a populated map + scan-like data
mpts = rng.uniform(-20, 20, size=(120000, 3)).astype(np.float32)
m = hm.make_map(map_cfg, DT)
m = hm.insert(m, map_cfg, jnp.asarray(mpts), jnp.ones(len(mpts), bool),
              jnp.zeros(len(mpts), bool))
pts_raw = jnp.asarray(rng.uniform(-15, 15, size=(cfg.n_points_max, 3)), DT)
pt_mask = jnp.arange(cfg.n_points_max) < 6400
pt_time = jnp.asarray(np.sort(rng.uniform(0, 0.1, cfg.n_points_max)), DT)
pts_ds = jnp.asarray(rng.uniform(-15, 15, size=(cfg.n_ds_max, 3)), DT)
ds_mask = jnp.arange(cfg.n_ds_max) < 2600
x0 = st.identity_state(DT)
P0 = jnp.eye(st.DOF, dtype=DT)
Q = process.process_noise_cov(0.1, 0.1, 1e-4, 1e-4, DT)
carry0 = imu_mod.init_imu_carry(DT)
imu_t = jnp.asarray(np.linspace(0, 0.1, cfg.n_imu_max), DT)
imu_acc = jnp.asarray(rng.normal(0, 0.1, (cfg.n_imu_max, 3)) + [0, 0, 9.81], DT)
imu_gyr = jnp.asarray(rng.normal(0, 0.05, (cfg.n_imu_max, 3)), DT)
imu_mask = jnp.ones(cfg.n_imu_max, bool)


def slope(name, fn, *args):
    fns = {n: jax.jit(partial(fn, n)) for n in (N_LO, N_HI)}
    t = {}
    for n, f in fns.items():
        out = f(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    per = (t[N_HI] - t[N_LO]) / (N_HI - N_LO)
    print(f"{name:44s} {per*1e3:8.3f} ms/iter")


def loop(body, n, init):
    return jax.lax.fori_loop(0, n, body, init)


def f_imu(n, x, P, carry):
    def body(i, s):
        x, P, c = s
        x2, P2, pts_d, c2 = imu_mod.propagate_and_deskew(
            x, P, Q, imu_t, imu_acc, imu_gyr, imu_mask, 1.0,
            jnp.asarray(-0.005, DT), jnp.asarray(0.1, DT), c,
            pts_raw, pt_time, deskew=True,
        )
        return (x, P, c2)  # keep x,P fixed so loop doesn't diverge
    return loop(body, n, (x, P, carry))


def f_downsample(n, pts, mask):
    def body(i, acc):
        c, om = voxel_downsample(pts + acc * 1e-12, mask, cfg.filter_size_surf,
                                 cfg.n_ds_max)
        return acc + c.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_knn(n, m, q):
    def body(i, acc):
        nb, sq, fo = hm.knn_search(m, map_cfg, q + acc * 1e-12)
        return acc + sq.sum() + nb.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_measurement(n, m, x):
    knn_fn = lambda q, mask: hm.knn_search(m, map_cfg, q)
    cache0 = meas.empty_cache(cfg.n_ds_max, DT, 0)
    def body(i, acc):
        h_x, h, sel, cache, valid, _pw = meas.compute_measurement(
            x._replace(pos=x.pos + acc * 1e-12), pts_ds, ds_mask, knn_fn,
            cache0, jnp.asarray(True), True,
        )
        return acc + h_x.sum() + h.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_update(n, m, x, P):
    knn_fn = lambda q, mask: hm.knn_search(m, map_cfg, q)
    cache0 = meas.empty_cache(cfg.n_ds_max, DT, 0)
    def h_fn(x_i, converge, cache):
        h_x, h, sel, cache, valid, _pw = meas.compute_measurement(
            x_i, pts_ds, ds_mask, knn_fn, cache, converge, True)
        return ekf.MeasOut(h_x, h, sel, valid, cache)
    def body(i, acc):
        res = ekf.update_iterated(
            x._replace(pos=x.pos + acc * 1e-12), P, h_fn, cache0,
            cfg.laser_point_cov, cfg.max_iteration, cfg.epsi)
        return acc + res.x.pos.sum()
    return loop(body, n, jnp.asarray(0.0, DT))


def f_insert(n, m):
    def body(i, mm):
        add, dsf = hm.insert_decisions(
            pts_ds, ds_mask, jnp.zeros((cfg.n_ds_max, 5, 3), DT),
            jnp.zeros((cfg.n_ds_max, 5), bool), jnp.asarray(True),
            cfg.filter_size_map)
        return hm.insert(mm, map_cfg, pts_ds, add, dsf)
    return loop(body, n, m)


def f_prune(n, m):
    def body(i, mm):
        return hm.prune_outside(mm, jnp.asarray([-150.0, -150, -150], DT),
                                jnp.asarray([150.0, 150, 150], DT))
    return loop(body, n, m)


if __name__ == "__main__":
    slope("imu propagate+deskew (32 knots, 8192 pts)", f_imu, x0, P0, carry0)
    slope("voxel downsample (8192 -> 4096)", f_downsample, pts_raw, pt_mask)
    slope("knn search (4096 q)", f_knn, m, pts_ds)
    slope("measurement (knn+fit+H, 1 eval)", f_measurement, m, x0)
    slope("full iterated update (3 iters)", f_update, m, x0, P0)
    slope("map insert (4096)", f_insert, m)
    slope("map prune", f_prune, m)
