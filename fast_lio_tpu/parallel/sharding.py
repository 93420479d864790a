"""Multi-device map-shard parallelism.

The reference is strictly single-host (SURVEY.md §2.8) — its scaling levers
are OpenMP over points and the ikd-Tree.  The TPU-native scaling design
(BASELINE.md) shards the *map spatially across devices* and keeps the filter
replicated:

* Each device owns the spatial cells whose ownership hash maps to it and
  holds them in a private voxel-hash table (same structure as the
  single-device map, 1/n the buckets).
* kNN: every device searches its shard for ALL queries (the query block is
  replicated), then the per-shard top-k candidates are all-gathered over ICI
  and re-top-k'd — exact, because the union of per-shard k-NN contains the
  global k-NN.
* Measurement reduction: the H rows are computed on a per-device slice of the
  point block; H^T H (12x12) and H^T h (12,) are psum'd — mathematically
  exact since the update consumes only those reductions
  (esekfom.hpp:1784,1804).
* Insert / prune: each device applies the (replicated) insert decisions to
  the points it owns.  The 23-DOF solve is replicated on every device.

Everything runs inside one ``shard_map`` over a 1-D "map" mesh axis, so the
same code path scales from 1 chip to a pod slice; collectives ride ICI.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import imu as imu_mod
from .. import state as st
from ..config import Config, LidarType
from ..filter import ekf
from ..math import so3
from ..map import hash_map as hm
from ..ops import measurement as meas
from ..ops.voxel_grid import voxel_downsample

AXIS = "map"

# n=1 intercept-attribution hooks (tools/bench_scaling.py --ablate): each
# skips one sharded-only cost while staying EXACT on a 1-device mesh.
# Never enable on n>1 — results would be per-shard-local, not global.
ABLATE_NO_MERGE = False  # skip the all-gather + re-top-k knn merge
ABLATE_NO_PSUM = False  # drop axis_name from the GN reduction + map_size


def local_map_cfg(cfg_global: hm.MapConfig, n_devices: int) -> hm.MapConfig:
    """Per-shard table: same capacity split n ways (n must be a power of 2 so
    shard ownership can use the hash bits above the bucket index)."""
    shift = int(np.log2(n_devices))
    assert 2**shift == n_devices, "device count must be a power of two"
    return cfg_global._replace(h_log2=max(cfg_global.h_log2 - shift, 4))


def make_sharded_map(
    cfg_global: hm.MapConfig, mesh: Mesh, dtype=jnp.float32
) -> hm.Map:
    """Global map pytree: per-device tables concatenated on the bucket dim,
    sharded over the mesh so each device holds exactly its own table."""
    n = mesh.devices.size
    lcfg = local_map_cfg(cfg_global, n)
    H, B = n * lcfg.num_buckets, lcfg.bucket_slots
    sh = NamedSharding(mesh, P(AXIS))
    packed = jnp.concatenate(
        [jnp.zeros((H, 3 * B), dtype=dtype),
         jnp.full((H, B), hm.W_FREE, dtype=dtype)], axis=-1,
    )
    return hm.Map(
        packed=jax.device_put(packed, sh),
        dropped=jax.device_put(
            jnp.zeros((n,), jnp.int32), sh
        ),  # per-shard overflow counter
    )


def _owner_of(cell: jnp.ndarray, lcfg: hm.MapConfig, n: int) -> jnp.ndarray:
    """Shard owning a spatial cell: hash bits above the bucket index."""
    h = hm.cell_hash(cell).astype(jnp.uint32)
    return (jnp.right_shift(h, lcfg.h_log2) % jnp.uint32(n)).astype(jnp.int32)


def _local_search_fn(cfg: Config, lcfg: hm.MapConfig, m_local: hm.Map):
    """Per-shard kNN over the LOCAL table (XLA region-gather — the one
    backend; the Pallas kernels were demoted to tools/, see
    pipeline.make_knn_fn)."""
    return partial(hm.knn_search, m_local, lcfg)


def _merge(nbrs, sq, k):
    """all-gather per-shard top-k + re-top-k (exact global kNN: the union of
    per-shard k-NN contains the global k-NN)."""
    all_nbrs = jax.lax.all_gather(nbrs, AXIS)  # (n, N, k, 3)
    all_sq = jax.lax.all_gather(sq, AXIS)
    n, N = all_sq.shape[0], all_sq.shape[1]
    all_nbrs = jnp.moveaxis(all_nbrs, 0, 1).reshape(N, n * k, 3)
    all_sq = jnp.moveaxis(all_sq, 0, 1).reshape(N, n * k)
    sq_m, idx = hm.smallest_k(
        jnp.where(jnp.isfinite(all_sq), all_sq, jnp.inf), k)
    nbrs_m = jnp.take_along_axis(all_nbrs, idx[..., None], axis=1)
    return nbrs_m, sq_m, jnp.isfinite(sq_m)


def _merged_knn(m_local: hm.Map, lcfg: hm.MapConfig, queries, k,
                cfg: Config = None, mask=None):
    """Shard-merged exact global kNN, with the single-device feature set:
    backend selection and the adaptive wide-region fallback
    (Config.knn_wide_fallback; see pipeline.make_knn_fn for semantics).

    The wide re-search is gated per scan like the single-device path, but the
    local 27-cell gather runs under lax.cond while the all-gather runs
    UNCONDITIONALLY on its (possibly dummy) result — collectives must not sit
    inside a conditional under shard_map, and the gather of a (N, k) block is
    noise next to the map-row gathers it saves."""
    base = _local_search_fn(cfg, lcfg, m_local) if cfg is not None \
        else partial(hm.knn_search, m_local, lcfg)
    nbrs, sq, found = base(queries, k)
    if ABLATE_NO_MERGE:  # exact at n=1 only (the union IS the local set)
        assert cfg is None or not cfg.knn_wide_fallback, \
            "ABLATE_NO_MERGE skips the wide fallback — avia-class cfg only"
        return nbrs, sq, found
    nbrs_m, sq_m, found_m = _merge(nbrs, sq, k)
    if cfg is None or not cfg.knn_wide_fallback:
        return nbrs_m, sq_m, found_m

    rcov2 = (0.5 * lcfg.cell_size) ** 2
    unsat = jnp.logical_or(jnp.logical_not(found_m[:, -1]),
                           sq_m[:, -1] > rcov2)
    if mask is not None:
        unsat = jnp.logical_and(unsat, mask)
    n_unsat = jnp.sum(unsat)
    need = n_unsat > 0
    # every device computes the same gate values (merged results are
    # replicated by construction), so the cond branches stay in lockstep
    # and the compaction indices below are identical on every shard.
    N = queries.shape[0]
    K_w = getattr(cfg, "knn_wide_max_queries", 2048) if cfg is not None else 0
    if K_w and K_w < N:
        # partial wide (r5, same exactness argument as make_knn_fn): a
        # globally-saturated query's true 5-NN lie within the narrow
        # coverage radius, so only the unsaturated queries (compacted into
        # K_w slots) need the 27-cell gather; their K_w-row merge is also a
        # much smaller collective.  Budget overflow falls back to the full
        # wide pass — identical results either way.
        (idx,) = jnp.nonzero(unsat, size=K_w, fill_value=N)
        safe = jnp.minimum(idx, N - 1)
        qsub = jnp.take(queries, safe, axis=0)
        small = n_unsat <= K_w
        nbrs_s, sq_s = jax.lax.cond(
            jnp.logical_and(need, small),
            lambda _: base(qsub, k, wide=True)[:2],
            lambda _: (jnp.take(nbrs, safe, axis=0),
                       jnp.take(sq, safe, axis=0)),
            operand=None,
        )
        nbrs_sm, sq_sm, found_sm = _merge(nbrs_s, sq_s, k)
        nbrs_w, sq_w = jax.lax.cond(
            jnp.logical_and(need, jnp.logical_not(small)),
            lambda _: base(queries, k, wide=True)[:2],
            lambda _: (nbrs, sq),
            operand=None,
        )
        nbrs_wm, sq_wm, found_wm = _merge(nbrs_w, sq_w, k)
        nbrs_p = nbrs_m.at[idx].set(nbrs_sm, mode="drop")
        sq_p = sq_m.at[idx].set(sq_sm, mode="drop")
        found_p = found_m.at[idx].set(found_sm, mode="drop")
        use_full = jnp.logical_and(need, jnp.logical_not(small))
        use_part = jnp.logical_and(need, small)

        def pick3(full, part, narrow):
            return jnp.where(use_full, full,
                             jnp.where(use_part, part, narrow))

        return (pick3(nbrs_wm, nbrs_p, nbrs_m),
                pick3(sq_wm, sq_p, sq_m),
                pick3(found_wm, found_p, found_m))

    nbrs_w, sq_w = jax.lax.cond(
        need,
        lambda _: base(queries, k, wide=True)[:2],
        lambda _: (nbrs, sq),
        operand=None,
    )
    nbrs_wm, sq_wm, found_wm = _merge(nbrs_w, sq_w, k)
    pick = lambda a, b: jnp.where(need, a, b)
    return (pick(nbrs_wm, nbrs_m), pick(sq_wm, sq_m),
            pick(found_wm, found_m))


def sharded_lio_step(
    cfg: Config,
    map_cfg_global: hm.MapConfig,
    n_devices: int,
    x: st.State,
    P_,
    m_local: hm.Map,
    imu_carry: imu_mod.ImuCarry,
    Q,
    imu_t_rel,
    imu_acc,
    imu_gyr,
    imu_mask,
    acc_scale,
    last_end_rel,
    pcl_end_rel,
    pts,
    pt_time,
    pt_mask,
    pt_intensity,
    lm_lo,
    lm_hi,
    lm_init,
    ekf_inited,
    do_update: bool = True,
):
    """Body executed per device inside shard_map (m_local is this shard's
    table; everything else replicated)."""
    from ..pipeline import fov_segment

    lcfg = local_map_cfg(map_cfg_global, n_devices)
    my = jax.lax.axis_index(AXIS)
    deskew = cfg.lidar_type != LidarType.MARSIM
    N = cfg.n_ds_max

    # 1-3: replicated propagate/deskew/cube-slide/downsample
    x, P_, pts_d, imu_carry = imu_mod.propagate_and_deskew(
        x, P_, Q, imu_t_rel, imu_acc, imu_gyr, imu_mask, acc_scale,
        last_end_rel, pcl_end_rel, imu_carry, pts, pt_time, deskew=deskew,
    )
    pos_lid = x.pos + so3.quat_rotate(x.rot, x.offset_T_L_I)
    new_lo, new_hi, lm_init2 = fov_segment(cfg, pos_lid, lm_lo, lm_hi, lm_init)
    # prune only when the cube moved (matches pipeline.lio_step; the
    # reference's lazy Delete_Point_Boxes also only fires on movement)
    moved = jnp.logical_or(jnp.any(new_lo != lm_lo), jnp.logical_not(lm_init))
    lm_lo, lm_hi, lm_init = new_lo, new_hi, lm_init2
    m_local = jax.lax.cond(
        moved, lambda mm: hm.prune_outside(mm, lm_lo, lm_hi), lambda mm: mm,
        m_local,
    )
    pts_ds, ds_mask, int_ds = voxel_downsample(
        pts_d, pt_mask, cfg.filter_size_surf, N, feats=pt_intensity,
        coord_bound=cfg.det_range * 1.25 + 5.0,  # matches pipeline.lio_step
    )

    # 4: update with shard-merged kNN + sliced rows + psum'd reductions
    cache0 = meas.empty_cache(N, pts_ds.dtype)
    knn_fn = lambda q, mask: _merged_knn(
        m_local, lcfg, q, meas.NUM_MATCH, cfg=cfg, mask=mask
    )
    slice_mask = (jnp.arange(N) % n_devices) == my

    def h_fn(x_i, converge, cache):
        h_x, h, rows, cache, valid, _pw = meas.compute_measurement(
            x_i, pts_ds, ds_mask, knn_fn, cache, converge,
            cfg.extrinsic_est_en, row_mask=slice_mask,
        )
        return ekf.MeasOut(h_x, h, rows, valid, cache)

    def run_update(_):
        res = ekf.update_iterated(
            x, P_, h_fn, cache0, cfg.laser_point_cov, cfg.max_iteration,
            cfg.epsi, axis_name=None if ABLATE_NO_PSUM else AXIS,
        )
        return res.x, res.P, res.carry, res.iterations

    def skip_update(_):
        return x, P_, cache0, jnp.asarray(0, jnp.int32)

    if isinstance(do_update, bool):
        # static: avoids placing the psum-carrying branch inside a
        # conditional (collectives in cond branches are backend-fragile)
        x, P_, cache, iters = (run_update if do_update else skip_update)(None)
    else:
        x, P_, cache, iters = jax.lax.cond(
            do_update, run_update, skip_update, operand=None
        )
    # selected is computed from replicated inputs, so the count is already
    # the GLOBAL effective-point count on every device (the per-device row
    # slicing happens downstream of `selected`, in compute_measurement's
    # row_mask) — no psum needed, and one would overcount n-fold.
    n_eff = jnp.sum(cache.selected)

    # 5: owner-routed insert
    pts_world = meas.body_to_world(x, pts_ds)
    add_mask, ds_flag = hm.insert_decisions(
        pts_world, ds_mask, cache.nbrs, cache.found, ekf_inited,
        cfg.filter_size_map,
    )
    owner = _owner_of(
        hm._cell_of(pts_world, lcfg.cell_size), lcfg, n_devices
    )
    add_mine = jnp.logical_and(add_mask, owner == my)
    m_local = hm.insert(m_local, lcfg, pts_world, add_mine, ds_flag)

    diag = dict(
        n_down=jnp.sum(ds_mask),
        n_eff=n_eff,
        iters=iters,
        map_size=(hm.map_size(m_local) if ABLATE_NO_PSUM
                  else jax.lax.psum(hm.map_size(m_local), AXIS)),
    )
    clouds = dict(world=pts_world, world_mask=ds_mask,
                  world_intensity=int_ds, body=pts_d, body_mask=pt_mask,
                  body_intensity=pt_intensity, effect_mask=cache.selected)
    return (x, P_, m_local, imu_carry, (lm_lo, lm_hi, lm_init), clouds, diag)


def wrap_sharded_step(cfg: Config, map_cfg: hm.MapConfig, mesh: Mesh,
                      do_update: bool = True):
    """shard_map-wrapped full step (unjitted).  Map arrays sharded on the
    bucket dim; all other inputs/outputs replicated.  ``do_update`` is bound
    statically: the psum inside the update cannot sit under a lax.cond, and
    an empty map no-ops the update anyway (zero effective points)."""
    n = mesh.devices.size
    body = partial(sharded_lio_step, cfg, map_cfg, n, do_update=do_update)

    map_specs = hm.Map(packed=P(AXIS), dropped=P(AXIS))
    rep = P()
    x_spec = st.State(*([rep] * 8))
    carry_spec = imu_mod.ImuCarry(rep, rep)
    in_specs = (
        x_spec, rep, map_specs, carry_spec, rep,  # x, P, map, imu_carry, Q
        rep, rep, rep, rep,  # imu block
        rep, rep, rep,  # scalars
        rep, rep, rep, rep,  # scan block (pts, t, mask, intensity)
        rep, rep, rep, rep,  # lm_lo, lm_hi, lm_init, ekf_inited
    )
    diag_spec = dict(n_down=rep, n_eff=rep, iters=rep, map_size=rep)
    clouds_spec = dict(world=rep, world_mask=rep, world_intensity=rep,
                       body=rep, body_mask=rep, body_intensity=rep,
                       effect_mask=rep)
    out_specs = (x_spec, rep, map_specs, carry_spec, (rep, rep, rep),
                 clouds_spec, diag_spec)

    return jax.shard_map(
        body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )


def make_sharded_step(cfg: Config, map_cfg: hm.MapConfig, mesh: Mesh):
    """Jitted sharded step (see wrap_sharded_step)."""
    return jax.jit(wrap_sharded_step(cfg, map_cfg, mesh), donate_argnums=(2,))


# ---------------------------------------------------------------------------
# driver dry run
# ---------------------------------------------------------------------------


def dryrun(devices: Sequence) -> None:
    """Build an n-device mesh, jit the full sharded step, run two chained
    steps on tiny shapes, and check the result NUMERICALLY against the
    single-device step on the same inputs (the driver validates multi-chip
    sharding with virtual CPU devices through this)."""
    import __graft_entry__ as ge  # reuse the example-input builder

    from ..pipeline import lio_step

    n = len(devices)
    mesh = Mesh(np.asarray(devices), (AXIS,))

    cfg = Config(
        lidar_type=LidarType.AVIA,
        n_points_max=1024,
        n_ds_max=512,
        n_imu_max=8,
        map_h_log2=10,
        map_bucket_slots=8,
        det_range=40.0,
        cube_side_length=300.0,
        knn_wide_fallback=True,  # exercise the full sharded feature set
    )
    map_cfg = hm.make_config(
        voxel_size=cfg.filter_size_map,
        h_log2=cfg.map_h_log2,
        bucket_slots=cfg.map_bucket_slots,
    )
    dtype = jnp.float32
    args = list(ge._example_inputs(cfg, map_cfg, dtype))
    m_single = args[2]
    args[2] = make_sharded_map(map_cfg, mesh, dtype)

    step = make_sharded_step(cfg, map_cfg, mesh)
    out = step(*args)
    jax.block_until_ready(out)
    # run a second step feeding the outputs back (exercises donation + the
    # populated-map path: the update genuinely runs against the seeded map)
    args2 = list(args)
    args2[0], args2[1], args2[2], args2[3] = out[0], out[1], out[2], out[3]
    args2[16], args2[17], args2[18] = out[4]  # local-map cube state
    out2 = step(*args2)
    jax.block_until_ready(out2)

    # ---- single-device reference: same two steps, same inputs ----
    from .. import state as st

    sstep = jax.jit(lambda *a: lio_step(cfg, map_cfg, *a, do_update=True))
    sargs = list(args)
    sargs[2] = m_single
    sout = sstep(*sargs)
    sargs2 = list(sargs)
    sargs2[0], sargs2[1], sargs2[2], sargs2[3] = (sout[0], sout[1], sout[2],
                                                  sout[3])
    sargs2[16], sargs2[17], sargs2[18] = sout[4]
    sout2 = sstep(*sargs2)

    # f32 + reassociated psum reductions: the iterates differ at roundoff,
    # which can flip a handful of voxel-boundary insert/gate decisions —
    # near-equality here is the f32 exactness bound; the bit-tight f64
    # equivalence proof lives in tests/test_sharding.py
    size_m, size_s = int(out2[6]["map_size"]), int(sout2[6]["map_size"])
    assert abs(size_m - size_s) <= max(8, size_s // 100), \
        f"map size diverged: {size_m} vs {size_s}"
    neff_m, neff_s = int(out2[6]["n_eff"]), int(sout2[6]["n_eff"])
    assert neff_s > 0, "dry run never exercised the update path"
    assert abs(neff_m - neff_s) <= max(8, neff_s // 100), \
        f"n_eff diverged: {neff_m} vs {neff_s}"
    dx = np.abs(np.asarray(st.boxminus(out2[0], sout2[0])))
    assert dx.max() < 5e-3, f"state diverged from single-device: |dx|={dx.max()}"
    print(f"dryrun_multichip OK on {n} devices: map_size={size_m}/{size_s}, "
          f"n_eff={neff_m}/{neff_s}, max|x_sharded - x_single|={dx.max():.2e}")
