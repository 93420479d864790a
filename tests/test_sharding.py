"""Multi-device map sharding: the sharded step must reproduce the
single-device step (same scan stream, map spatially sharded over the 8
virtual CPU devices) — the multi-host test SURVEY.md §4 calls for."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from fast_lio_tpu import imu as imu_mod
from fast_lio_tpu import state as st
from fast_lio_tpu.config import Config, LidarType
from fast_lio_tpu.filter import process
from fast_lio_tpu.map import hash_map as hm
from fast_lio_tpu.parallel import sharding
from fast_lio_tpu.pipeline import lio_step

RNG = np.random.default_rng(21)
# f64: the single-device and sharded paths compute the SAME math with
# different reduction orders (psum of per-shard partial HtH vs one matmul).
# In f32 that rounding can flip one gate (s>0.9 / 5th-NN<=5) on a point near
# threshold, after which two not-yet-converged GN runs legitimately differ at
# the cm level (observed; the e2e f32 realism check lives in
# test_sharded_pipeline.py).  In f64 no gate flips, so equivalence is tight
# and the assertions below prove the sharded ALGORITHM is exact.
DT = jnp.float64


def make_cfg(wide=False, wide_max_queries=2048):
    cfg = Config(
        lidar_type=LidarType.AVIA,
        n_points_max=2048,
        n_ds_max=1024,
        n_imu_max=16,
        map_h_log2=12,
        map_bucket_slots=8,
        filter_size_surf=0.3,
        filter_size_map=0.3,
        knn_backend="xla",
        knn_wide_fallback=wide,
        knn_wide_max_queries=wide_max_queries,
    )
    map_cfg = hm.make_config(
        voxel_size=cfg.filter_size_map,
        h_log2=cfg.map_h_log2,
        bucket_slots=64,  # roomy: a full 4x4x4-voxel cell's worth of points
    )
    return cfg, map_cfg


def make_inputs(cfg):
    M = cfg.n_imu_max
    imu_t = jnp.asarray(np.linspace(0, 0.1, M), DT)
    imu_acc = jnp.asarray(
        np.tile([0, 0, st.S2_LENGTH], (M, 1)) + RNG.normal(size=(M, 3)) * 1e-3, DT
    )
    imu_gyr = jnp.asarray(RNG.normal(size=(M, 3)) * 0.02, DT)
    imu_mask = jnp.ones(M, bool)

    N = cfg.n_points_max
    # points on the walls of a box (so planes fit)
    n_per = N // 3
    u = RNG.uniform(-8, 8, size=(n_per, 2))
    p1 = np.column_stack([u[:, 0], u[:, 1], np.zeros(n_per)])  # floor
    p2 = np.column_stack([np.full(n_per, 8.0), u[:, 0], 0.5 + 0.2 * u[:, 1]])
    p3 = np.column_stack([u[:, 0], np.full(n_per, -8.0), 0.5 + 0.2 * u[:, 1]])
    pts = np.concatenate([p1, p2, p3])
    pts = np.concatenate([pts, np.zeros((N - len(pts), 3))])
    ptt = np.linspace(0, 0.1, N)
    pt_mask = np.arange(N) < 3 * n_per

    lo = jnp.asarray([-150.0, -150.0, -150.0], DT)
    hi = jnp.asarray([150.0, 150.0, 150.0], DT)
    return (
        imu_t, imu_acc, imu_gyr, imu_mask,
        jnp.asarray(1.0, DT), jnp.asarray(0.0, DT), jnp.asarray(0.1, DT),
        jnp.asarray(pts, DT), jnp.asarray(ptt, DT), jnp.asarray(pt_mask),
        jnp.zeros(N, DT),  # intensity
        lo, hi, jnp.asarray(True), jnp.asarray(True),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("wide,wmax", [(False, 2048), (True, 2048),
                                       (True, 64), (True, 2)],
                         ids=["standard", "wide_fallback",
                              "wide_partial_compaction", "wide_overflow"])
def test_sharded_step_matches_single_device(wide, wmax):
    """f64 single-device vs 8-shard equivalence, with and without the
    adaptive wide-region fallback (the sharded path must carry the full
    single-device feature set, VERDICT r2 item 6).  The r5 partial-wide
    compaction is exercised in BOTH paths (wmax=64 < the 1024-query pad
    forces the compaction arm; wmax=2 forces the overflow -> full-wide
    arm)."""
    cfg, map_cfg = make_cfg(wide, wmax)
    mesh = Mesh(np.asarray(jax.devices()[:8]), (sharding.AXIS,))

    x0 = st.identity_state(DT)._replace(
        grav=jnp.asarray([0.0, 0.0, -st.S2_LENGTH], DT)
    )
    P0 = jnp.eye(st.DOF, dtype=DT)
    Q = process.process_noise_cov(0.1, 0.1, 1e-4, 1e-4, DT)
    carry0 = imu_mod.init_imu_carry(DT)

    # two rounds: build the map on round 1 (no update), update on round 2
    ins1 = make_inputs(cfg)
    ins2 = make_inputs(cfg)

    # single device
    m_s = hm.make_map(map_cfg, DT)
    xs, Ps, m_s, cs, lms_s, cl_s, d_s = jax.jit(
        lambda *a: lio_step(cfg, map_cfg, *a, do_update=False)
    )(x0, P0, m_s, carry0, Q, *ins1)
    xs, Ps, m_s, cs, lms_s, cl_s, d_s = jax.jit(
        lambda *a: lio_step(cfg, map_cfg, *a, do_update=True)
    )(xs, Ps, m_s, cs, Q, *ins2)

    # sharded (wrappers built like make_sharded_step, one per do_update value)
    m_m = sharding.make_sharded_map(map_cfg, mesh, DT)
    from functools import partial

    from jax.sharding import PartitionSpec as P

    rep = P()
    map_specs = hm.Map(packed=P(sharding.AXIS), dropped=P(sharding.AXIS))
    x_spec = st.State(*([rep] * 8))
    carry_spec = imu_mod.ImuCarry(rep, rep)
    in_specs = (x_spec, rep, map_specs, carry_spec, rep) + (rep,) * 15
    diag_spec = dict(n_down=rep, n_eff=rep, iters=rep, map_size=rep)
    clouds_spec = dict(world=rep, world_mask=rep, world_intensity=rep,
                       body=rep, body_mask=rep, body_intensity=rep,
                       effect_mask=rep)
    out_specs = (x_spec, rep, map_specs, carry_spec, (rep, rep, rep),
                 clouds_spec, diag_spec)

    def wrap(do_update):
        return jax.jit(
            jax.shard_map(
                partial(sharding.sharded_lio_step, cfg, map_cfg, 8,
                        do_update=do_update),
                mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        )

    xm, Pm, m_m, cm, lms_m, cl_m, d_m = wrap(False)(
        x0, P0, m_m, carry0, Q, *ins1
    )

    # --- after the insert-only round the maps must be IDENTICAL (insert is
    # deterministic across shard counts) and the shard-merged kNN must equal
    # the single-table kNN exactly on that shared content ---
    def live_set(m):
        return set(map(tuple, np.round(hm.flatten(m), 5)))

    # single-device round 1 state for comparison
    m_s1 = hm.make_map(map_cfg, DT)
    xs1, Ps1, m_s1, cs1, *_ = jax.jit(
        lambda *a: lio_step(cfg, map_cfg, *a, do_update=False)
    )(x0, P0, m_s1, carry0, Q, *ins1)
    assert live_set(m_s1) == live_set(m_m)

    q = np.asarray(sorted(live_set(m_s1)))[:256].astype(np.float32) + 0.07
    nb_s, sq_s, f_s = hm.knn_search(m_s1, map_cfg, jnp.asarray(q), 5)
    lcfg = sharding.local_map_cfg(map_cfg, 8)
    merged = jax.jit(
        jax.shard_map(
            lambda m, qq: sharding._merged_knn(m, lcfg, qq, 5),
            mesh=mesh,
            in_specs=(map_specs, rep),
            out_specs=(rep, rep, rep),
            check_vma=False,
        )
    )
    nb_m, sq_m, f_m = merged(m_m, jnp.asarray(q))
    assert bool((f_s == f_m).all())
    sq_sn = np.where(np.isfinite(np.asarray(sq_s)), np.asarray(sq_s), -1)
    sq_mn = np.where(np.isfinite(np.asarray(sq_m)), np.asarray(sq_m), -1)
    np.testing.assert_allclose(sq_sn, sq_mn, atol=1e-11)

    # --- update round: psum reassociation may flip a convergence-gated
    # iteration, so single and sharded agree to the filter's own tolerance ---
    xm, Pm, m_m, cm, lms_m, cl_m, d_m = wrap(True)(
        xm, Pm, m_m, cm, Q, *ins2
    )
    size_s, size_m = int(d_s["map_size"]), int(d_m["map_size"])
    assert size_s == size_m
    neff_s, neff_m = int(d_s["n_eff"]), int(d_m["n_eff"])
    assert neff_s == neff_m
    # f64: no gate flips -> the two paths track the same GN iterates; only
    # reduction-order rounding (~1e-13) separates them
    dx = np.asarray(st.boxminus(xs, xm))
    np.testing.assert_allclose(dx, 0.0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(Ps), np.asarray(Pm), atol=1e-8)
