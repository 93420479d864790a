"""The LIO pipeline: host orchestration around one jitted per-scan step.

TPU-native re-design of the reference node's main loop
(/root/reference/src/laserMapping.cpp:865-1019).  The reference's
callback/polling architecture (mutex deques + 5 kHz spin) collapses into:

  host: sensor buffering + packet sync (sync_packages analog) + IMU static
        init + local-map cube bookkeeping + padding/bucketing
  device (one jit): IMU propagate + deskew -> voxel downsample -> iterated
        point-to-plane iEKF update -> map insert, all fixed shapes

Per-scan dataflow matches SURVEY.md §3.3 stage for stage; timing is recorded
per stage in the reference's CSV schema (laserMapping.cpp:1042-1044) via
utils.timing.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import imu as imu_mod
from . import state as st
from .config import Config, LidarType
from .filter import ekf, process
from .map import hash_map as hm
from .math import so3
from .ops import measurement as meas
from .ops.voxel_grid import voxel_downsample

MOV_THRESHOLD = 1.5  # laserMapping.cpp:78


def make_knn_fn(cfg: Config, map_cfg: hm.MapConfig, m: hm.Map):
    """(queries (N,3), mask (N,)) -> (nbrs, sq, found) against map ``m``.

    The backend is the XLA region-gather (hash_map.knn_search).  Two Pallas
    kernels were built and measured on chip and both LOSE to it — r3
    per-query kernel 1.40 ms/search and r4 region-grouped kernel 22.7
    ms/search vs XLA's 0.46 at bench shapes (PERF.md "kNN backends") — so
    they were demoted to tools/knn_pallas.py / tools/knn_grouped.py (kept
    runnable + parity-tested for study).  Optionally wraps the adaptive
    wide-region fallback
    (Config.knn_wide_fallback): when any live query is unsaturated — fewer
    than 5 neighbors found, or its 5th NN beyond the guaranteed coverage
    radius cell_size/2 — the search re-runs over the centered 3x3x3 region
    (coverage radius cell_size), recovering the reference's unbounded
    ikd-Tree search semantics up to the sqrt(5) m gate for
    cell_size >= sqrt(5) (laserMapping.cpp:671)."""
    from functools import partial as _partial

    if cfg.knn_backend not in ("auto", "xla"):
        raise ValueError(
            f"knn_backend={cfg.knn_backend!r}: the Pallas kernels were "
            "demoted to tools/ after losing on chip (PERF.md); use 'auto'")

    if cfg.rescore_research:
        if cfg.knn_wide_fallback:
            # the cached-candidate rescore re-ranks the 2x2x2 block only; a
            # silent rescore+wide combination would A/B different search
            # semantics (ADVICE r4)
            raise ValueError(
                "rescore_research does not compose with knn_wide_fallback: "
                "the cached candidate block never covers the wide 3x3x3 "
                "region — disable one of the two")
        inner = _partial(hm.knn_search, m, map_cfg, return_candidates=True)
        return lambda q, mask: inner(q)

    base = _partial(hm.knn_search, m, map_cfg)

    if not cfg.knn_wide_fallback:
        return lambda q, mask: base(q)

    rcov2 = (0.5 * map_cfg.cell_size) ** 2
    # partial-wide compaction (r5): only the unsaturated queries need the
    # 3x3x3 region.  EXACT: a saturated query's 5th NN lies within the
    # narrow region's guaranteed coverage radius cell_size/2, so its true
    # 5-NN are all inside the narrow region and the wide re-search could
    # not change its result (the centered 3x3x3 is a superset of the
    # round-to-corner 2x2x2).  Compacting the (typically few) unsaturated
    # queries into K_w slots cuts the wide gather's row count — at ouster64
    # shapes the all-queries wide search alone was 10.2 ms/scan (r5 stage
    # table).  If more than K_w queries are unsaturated the full wide
    # search runs instead (same results, old cost).
    K_w = getattr(cfg, "knn_wide_max_queries", 2048)

    def with_fallback(queries, mask):
        N = queries.shape[0]
        nbrs, sq, found = base(queries)
        unsat = jnp.logical_or(
            jnp.logical_not(found[:, -1]), sq[:, -1] > rcov2
        )
        unsat = jnp.logical_and(unsat, mask)
        n_unsat = jnp.sum(unsat)

        if K_w and K_w < N:
            # fill_value=N + mode="drop" => pad rows scatter nowhere
            (idx,) = jnp.nonzero(unsat, size=K_w, fill_value=N)
            qsub = jnp.take(queries, jnp.minimum(idx, N - 1), axis=0)

            def partial_wide(_):
                nw, sw, fw = base(qsub, wide=True)
                return (
                    nbrs.at[idx].set(nw, mode="drop"),
                    sq.at[idx].set(sw, mode="drop"),
                    found.at[idx].set(fw, mode="drop"),
                )

            def dispatch(_):
                return jax.lax.cond(
                    n_unsat <= K_w, partial_wide,
                    lambda _: base(queries, wide=True), operand=None)
        else:
            def dispatch(_):
                return base(queries, wide=True)

        return jax.lax.cond(
            n_unsat > 0,
            dispatch,
            lambda _: (nbrs, sq, found),
            operand=None,
        )

    return with_fallback


@dataclasses.dataclass
class ScanPacket:
    """A synced measurement packet (the MeasureGroup analog, common_lib.h:55-66)."""

    lidar_beg_time: float
    lidar_end_time: float
    pts: np.ndarray  # (n, 3) f32, LiDAR frame
    pt_time: np.ndarray  # (n,) seconds, offset from lidar_beg_time
    imu_t: np.ndarray  # (m,) absolute seconds
    imu_acc: np.ndarray  # (m, 3)
    imu_gyr: np.ndarray  # (m, 3)
    intensity: Optional[np.ndarray] = None  # (n,) f32 (reference carries it
    # in PointType.intensity through to the published clouds)
    preprocess_time: float = 0.0  # host decode seconds for this scan (the
    # reference's per-frame preprocess CSV column, laserMapping.cpp:1042-1044)


class SyncBuffer:
    """sync_packages (laserMapping.cpp:368-424): pair one LiDAR scan with all
    IMU messages up to the scan-end time, with the mean-scantime fallback for
    degenerate scans."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.lidar_buf: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.imu_t: List[float] = []
        self.imu_acc: List[np.ndarray] = []
        self.imu_gyr: List[np.ndarray] = []
        self.mean_scantime = 0.0
        self.scan_num = 0
        self.last_timestamp_lidar = -np.inf
        self.last_timestamp_imu = -np.inf
        self.last_imu: Optional[Tuple[float, np.ndarray, np.ndarray]] = None
        # soft time sync (laserMapping.cpp:300-324,343-347)
        self.timediff_lidar_wrt_imu = 0.0
        self.timediff_set = False

    def push_lidar(self, stamp: float, pts: np.ndarray, pt_time: np.ndarray,
                   intensity: Optional[np.ndarray] = None,
                   preprocess_time: float = 0.0):
        if stamp < self.last_timestamp_lidar:  # loop-back clear (:284-288)
            self.lidar_buf.clear()
        self.last_timestamp_lidar = stamp
        if (self.cfg.time_sync_en and not self.timediff_set
                and abs(stamp - self.last_timestamp_imu) > 1
                and np.isfinite(self.last_timestamp_imu) and self.imu_t):
            # one-shot clock-offset estimate (laserMapping.cpp:319-324)
            self.timediff_set = True
            self.timediff_lidar_wrt_imu = stamp + 0.1 - self.last_timestamp_imu
        self.lidar_buf.append((stamp, pts, pt_time, intensity, preprocess_time))

    def push_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        t = t - self.cfg.time_offset_lidar_to_imu
        if abs(self.timediff_lidar_wrt_imu) > 0.1 and self.cfg.time_sync_en:
            t = t + self.timediff_lidar_wrt_imu  # (laserMapping.cpp:343-347)
        if t < self.last_timestamp_imu:  # loop-back clear (:353-357)
            self.imu_t.clear()
            self.imu_acc.clear()
            self.imu_gyr.clear()
        self.last_timestamp_imu = t
        self.imu_t.append(t)
        self.imu_acc.append(np.asarray(acc, np.float64))
        self.imu_gyr.append(np.asarray(gyr, np.float64))

    def pop_packet(self) -> Optional[ScanPacket]:
        if not self.lidar_buf or not self.imu_t:
            return None
        stamp, pts, pt_time, intensity, pre_t = self.lidar_buf[0]
        if len(pts) <= 1:
            end = stamp + self.mean_scantime
        elif pt_time[-1] < 0.5 * self.mean_scantime:
            end = stamp + self.mean_scantime
        else:
            self.scan_num += 1
            end = stamp + pt_time[-1]
            self.mean_scantime += (pt_time[-1] - self.mean_scantime) / self.scan_num
        if self.cfg.lidar_type == LidarType.MARSIM:
            end = stamp
        if self.last_timestamp_imu < end:
            return None  # wait for IMU to catch up

        # IMU block: previous tail sample + all samples <= scan end
        take = 0
        while take < len(self.imu_t) and self.imu_t[take] <= end:
            take += 1
        sel_t = self.imu_t[:take]
        sel_a = self.imu_acc[:take]
        sel_g = self.imu_gyr[:take]
        if self.last_imu is not None:
            sel_t = [self.last_imu[0]] + sel_t
            sel_a = [self.last_imu[1]] + sel_a
            sel_g = [self.last_imu[2]] + sel_g
        if take:
            self.last_imu = (self.imu_t[take - 1], self.imu_acc[take - 1],
                             self.imu_gyr[take - 1])
        del self.imu_t[:take], self.imu_acc[:take], self.imu_gyr[:take]
        self.lidar_buf.pop(0)
        return ScanPacket(
            lidar_beg_time=stamp,
            lidar_end_time=end,
            pts=pts,
            pt_time=pt_time,
            imu_t=np.asarray(sel_t),
            imu_acc=np.stack(sel_a) if sel_a else np.zeros((0, 3)),
            imu_gyr=np.stack(sel_g) if sel_g else np.zeros((0, 3)),
            intensity=intensity,
            preprocess_time=pre_t,
        )


@dataclasses.dataclass
class StepDiag:
    """Per-scan diagnostics (the runtime_pos_log fields).

    Device-produced fields (n_down/n_effective/iterations/map_size) are held
    as lazy device scalars so recording them never blocks the pipeline;
    ``int()`` them (or call Pipeline.materialize_diags) to read.
    """

    n_raw: int = 0
    n_truncated: int = 0
    n_down: object = 0
    n_effective: object = 0
    iterations: object = 0
    map_size: object = 0
    total_time: float = 0.0
    preprocess_time: float = 0.0


def fov_segment(cfg: Config, pos_lid, lm_lo, lm_hi, lm_init):
    """Device-side lasermap_fov_segment (laserMapping.cpp:231-277): slide the
    local-map cube when the LiDAR nears a face.  Pure jnp so the per-scan
    step needs no host round trip; pruning to the new cube subsumes the
    reference's vacated-slab deletions."""
    dtype = pos_lid.dtype
    cube = jnp.asarray(cfg.cube_side_length, dtype)
    det = jnp.asarray(cfg.det_range, dtype)
    half = cube / 2.0

    init_lo = pos_lid - half
    init_hi = pos_lid + half

    d_lo = jnp.abs(pos_lid - lm_lo)
    d_hi = jnp.abs(pos_lid - lm_hi)
    thr = MOV_THRESHOLD * det
    mov = jnp.maximum(
        (cube - 2.0 * MOV_THRESHOLD * det) * 0.5 * 0.9,
        det * (MOV_THRESHOLD - 1.0),
    )
    shift = jnp.where(d_lo <= thr, -mov, jnp.where(d_hi <= thr, mov, 0.0))
    new_lo = jnp.where(lm_init, lm_lo + shift, init_lo)
    new_hi = jnp.where(lm_init, lm_hi + shift, init_hi)
    return new_lo, new_hi, jnp.asarray(True)


def lio_step(
    cfg: Config,
    map_cfg: hm.MapConfig,
    x: st.State,
    P,
    m: hm.Map,
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
    do_update=True,
):
    """One full per-scan LIO step (jittable; cfg/map_cfg static).

    Fuses the reference's per-scan hot path (SURVEY.md §3.3): IMU propagate +
    deskew -> local-map cube slide + prune -> voxel downsample -> iterated
    point-to-plane iEKF update -> map insert.  Returns (x, P, map, imu_carry,
    (lm_lo, lm_hi, lm_init), pts_world, ds_mask, diag).  Everything including
    the cube bookkeeping lives on device: the host never syncs per scan.

    ``do_update`` may be a traced bool: the map-seeding first scan runs the
    same compiled program with the update conditionally skipped (XLA compile
    on the tunnel backend is expensive — one program, not two).
    """
    deskew = cfg.lidar_type != LidarType.MARSIM

    # 1. IMU propagate + deskew (hot loop #1)
    x, P, pts_d, imu_carry = imu_mod.propagate_and_deskew(
        x, P, Q, imu_t_rel, imu_acc, imu_gyr, imu_mask, acc_scale,
        last_end_rel, pcl_end_rel, imu_carry, pts, pt_time, deskew=deskew,
    )

    # 2. local-map slide; prune only when the cube actually moved (the
    # reference's lazy Delete_Point_Boxes also only fires on movement)
    pos_lid = x.pos + so3.quat_rotate(x.rot, x.offset_T_L_I)
    new_lo, new_hi, lm_init2 = fov_segment(cfg, pos_lid, lm_lo, lm_hi, lm_init)
    moved = jnp.logical_or(
        jnp.any(new_lo != lm_lo), jnp.logical_not(lm_init)
    )
    lm_lo, lm_hi, lm_init = new_lo, new_hi, lm_init2
    m = jax.lax.cond(
        moved, lambda mm: hm.prune_outside(mm, lm_lo, lm_hi), lambda mm: mm, m
    )

    # 3. input voxel downsample (PCL VoxelGrid analog; intensity is voxel-
    # averaged alongside like PCL's downsample_all_data)
    pts_ds, ds_mask, int_ds = voxel_downsample(
        pts_d, pt_mask, cfg.filter_size_surf, cfg.n_ds_max, feats=pt_intensity,
        coord_bound=cfg.det_range * 1.25 + 5.0,  # body frame + deskew margin
    )

    # 4. iterated point-to-plane update (hot loops #2-#4)
    cache0 = meas.empty_cache(cfg.n_ds_max, pts_ds.dtype)
    knn_fn = make_knn_fn(cfg, map_cfg, m)
    if cfg.rescore_research:
        # ONE map gather per scan (r5): the full region search runs here,
        # BEFORE the GN loop, at the predicted pose — identical to what the
        # loop's first iteration would search — and the (N, C, 3) candidate
        # block enters h_fn as a closure constant.  Every converge-gated
        # "re-search" inside the loop is then a pure re-rank of that block
        # (hash_map.rescore_candidates), and the block never rides the
        # while_loop carry through a cond select (which copied it per
        # iteration in the r4 wiring).  Re-ranking at the search pose
        # reproduces the full search's top-k exactly (same candidate set,
        # same masks, same tie order), so iteration 0 is bit-identical to a
        # real search; later iterations deviate only by the mm-scale pose
        # motion between GN iterates (Config.rescore_research docs).
        p_world0 = meas.body_to_world(x, pts_ds)
        cand_pts, cand_ok = knn_fn(p_world0, ds_mask)[3:]
        knn_fn = lambda q, mask: hm.rescore_candidates(
            cand_pts, cand_ok, q, meas.NUM_MATCH)

    def h_fn(x_i, converge, cache):
        h_x, h, sel, cache, valid, _pw = meas.compute_measurement(
            x_i, pts_ds, ds_mask, knn_fn, cache, converge,
            cfg.extrinsic_est_en,
        )
        return ekf.MeasOut(h_x, h, sel, valid, cache)

    def run_update(_):
        res = ekf.update_iterated(
            x, P, h_fn, cache0, cfg.laser_point_cov, cfg.max_iteration,
            cfg.epsi,
        )
        return res.x, res.P, res.carry, res.iterations

    def skip_update(_):
        return x, P, cache0, jnp.asarray(0, jnp.int32)

    if isinstance(do_update, bool):
        x, P, cache, iters = (run_update if do_update else skip_update)(None)
    else:
        x, P, cache, iters = jax.lax.cond(
            do_update, run_update, skip_update, operand=None
        )
    n_eff = jnp.sum(cache.selected)

    # 5. map insert with hysteresis (hot loop #5)
    pts_world = meas.body_to_world(x, pts_ds)
    add_mask, ds_flag = hm.insert_decisions(
        pts_world, ds_mask, cache.nbrs, cache.found, ekf_inited,
        cfg.filter_size_map,
    )
    m = hm.insert(m, map_cfg, pts_world, add_mask, ds_flag)

    diag = dict(
        n_down=jnp.sum(ds_mask), n_eff=n_eff, iters=iters,
        map_size=hm.map_size(m),
    )
    clouds = dict(
        world=pts_world, world_mask=ds_mask,  # /cloud_registered (downsampled)
        world_intensity=int_ds,
        body=pts_d, body_mask=pt_mask,  # /cloud_registered_body (dense)
        body_intensity=pt_intensity,
        effect_mask=cache.selected,  # /cloud_effected (world[effect_mask])
    )
    return x, P, m, imu_carry, (lm_lo, lm_hi, lm_init), clouds, diag


class Pipeline:
    """End-to-end odometry: feed packets, read poses.

    Pass ``mesh`` (a 1-D jax.sharding.Mesh) to run with the map spatially
    sharded across devices — same API, same packets; the per-scan step runs
    under shard_map with merged kNN and psum'd Gauss-Newton reductions
    (fast_lio_tpu.parallel.sharding).
    """

    def __init__(self, cfg: Config, mesh=None):
        if mesh is not None and cfg.rescore_research:
            # candidate blocks are per-shard; re-ranking them cross-device
            # would need an (N, C, 3) all-gather per iteration.  Explicitly
            # unsupported rather than silently divergent.
            raise NotImplementedError(
                "rescore_research is not supported with a sharded map; "
                "use the default re-search mode")
        self.cfg = cfg
        self.mesh = mesh
        self.dtype = jnp.dtype(cfg.compute_dtype)
        self.map_cfg = hm.make_config(
            voxel_size=cfg.filter_size_map,
            h_log2=cfg.map_h_log2,
            bucket_slots=cfg.map_bucket_slots,
            cell_multiplier=cfg.map_cell_multiplier,
        )
        self.sync = SyncBuffer(cfg)

        # estimator state (device)
        self.x = st.identity_state(self.dtype)
        self.P = jnp.eye(st.DOF, dtype=self.dtype)
        self.Q = process.process_noise_cov(
            cfg.gyr_cov, cfg.acc_cov, cfg.b_gyr_cov, cfg.b_acc_cov, self.dtype
        )
        self._rep_sharding = None
        if mesh is None:
            self.map = hm.make_map(self.map_cfg, self.dtype)
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            from .parallel import sharding as shd

            self.map = shd.make_sharded_map(self.map_cfg, mesh, self.dtype)
            # replicate the estimator state over the mesh explicitly — under
            # multi-process jax.distributed, single-device-committed inputs
            # to a global-mesh jit are invalid; every process holds the same
            # values, so a replicated device_put is both legal and exact
            self._rep_sharding = NamedSharding(mesh, PartitionSpec())
            rep = lambda t: jax.device_put(t, self._rep_sharding)
            self.x, self.P, self.Q = rep(self.x), rep(self.P), rep(self.Q)
        self.imu_carry = imu_mod.init_imu_carry(self.dtype)

        # local-map cube state lives on device (no per-scan host sync)
        self.lm_state = (
            jnp.zeros(3, self.dtype),
            jnp.zeros(3, self.dtype),
            jnp.asarray(False),
        )
        if self._rep_sharding is not None:
            self.imu_carry = jax.device_put(self.imu_carry, self._rep_sharding)
            self.lm_state = jax.device_put(self.lm_state, self._rep_sharding)

        # scan-size pad buckets (one compile each, persistent-cached)
        self.pad_buckets = tuple(sorted(set(
            cfg.pad_buckets or (cfg.n_points_max,))))
        self.truncated_points = 0
        self._warned_truncation = False

        # host state
        self.imu_stats = imu_mod.empty_stats()
        self.imu_need_init = True
        self.acc_scale = 1.0
        self.first_lidar_time: Optional[float] = None
        self.last_lidar_end_time = 0.0
        self.map_built = False
        # trajectory holds (stamp, pos, quat) with pos/quat as device-array
        # handles; get_trajectory() materializes them
        self.trajectory: List[Tuple[float, jnp.ndarray, jnp.ndarray]] = []
        self.state_log: List[Tuple[float, st.State]] = []  # runtime_pos_log
        self.diags: List[StepDiag] = []
        self.last_pts_world = None  # device handles
        self.last_pts_world_mask = None
        self.last_pts_world_intensity = None
        self.last_pts_body = None
        self.last_pts_body_mask = None
        self.last_pts_body_intensity = None

        self._step_fn = self._build_step()

    # ------------------------------------------------------------------
    # jitted kernels
    # ------------------------------------------------------------------

    def _build_step(self):
        cfg, map_cfg = self.cfg, self.map_cfg

        if self.mesh is None:
            inner = partial(lio_step, cfg, map_cfg)
        else:
            from .parallel import sharding as shd

            n = self.mesh.devices.size
            # the sharded step runs the update unconditionally (its psum
            # cannot sit inside lax.cond); an empty map naturally yields
            # zero effective points and the update no-ops via `valid`
            inner = shd.wrap_sharded_step(cfg, map_cfg, self.mesh)

        # Packed calling convention: the tunnel backend charges ~0.4 ms per
        # host->device dispatch, so the per-scan inputs travel as ONE flat
        # f32 buffer — [scalars (8) | imu (M,7: t+acc+gyr) | pts (N*3) |
        # pt_time (N) | intensity (N)] — and the masks are rebuilt on device
        # from the counts.  The scan fields are CONTIGUOUS blocks (not an
        # interleaved (N,5) record): each host fill is then one memcpy-speed
        # slice assign instead of a stride-5 scatter — ~10x cheaper packing
        # at ouster shapes (VERDICT r4 host-path item).  The scan pad N is a
        # per-call shape: process_packet buckets each scan to the smallest
        # pad in Config.pad_buckets that fits (one compile per bucket,
        # persistent-cached), so small scans cost proportionally less and
        # big scans are not silently clipped.
        sharded = self.mesh is not None
        M = cfg.n_imu_max

        def packed(x, P, m, imu_carry, Q, buf, lm_lo, lm_hi, lm_init):
            scalars = buf[:8]
            imu = buf[8:8 + M * 7].reshape(M, 7)
            N = (buf.shape[0] - 8 - M * 7) // 5
            o = 8 + M * 7
            pts = buf[o:o + N * 3].reshape(N, 3)
            pt_time = buf[o + N * 3:o + N * 4]
            pt_int = buf[o + N * 4:o + N * 5]
            n_pts = scalars[3].astype(jnp.int32)
            n_imu = scalars[4].astype(jnp.int32)
            pt_mask = jnp.arange(N) < n_pts
            imu_mask = jnp.arange(M) < n_imu
            imu_t = jnp.where(imu_mask, imu[:, 0], 1e9)
            args = (
                x, P, m, imu_carry, Q,
                imu_t, imu[:, 1:4], imu[:, 4:7], imu_mask,
                scalars[0], scalars[1], scalars[2],
                pts, pt_time, pt_mask, pt_int,
                lm_lo, lm_hi, lm_init,
                scalars[5] > 0.5,
            )
            if sharded:
                return inner(*args)
            return inner(*args, scalars[6] > 0.5)

        return jax.jit(packed, donate_argnums=(2,))

    def _pad_for(self, n: int) -> int:
        """Smallest configured pad >= n (largest if none fits; the overflow
        is counted, never silent — see process_packet)."""
        pads = [p for p in self.pad_buckets if p >= n]
        return min(pads) if pads else max(self.pad_buckets)

    # ------------------------------------------------------------------
    # host orchestration
    # ------------------------------------------------------------------

    def get_trajectory(self):
        """Materialized trajectory [(t, pos np(3,), quat np(4,)), ...]."""
        return [
            (t, np.asarray(jax.device_get(p), np.float64),
             np.asarray(jax.device_get(q), np.float64))
            for t, p, q in self.trajectory
        ]

    def health_check(self) -> dict:
        """On-demand estimator health report (syncs the device).

        The reference's failure handling is a handful of inline guards
        (SURVEY.md §5); a production service wants an inspectable surface:
        NaN state, covariance conditioning, map pressure (overflow drops).
        """
        x = jax.device_get(self.x)
        P = np.asarray(jax.device_get(self.P))
        nan_state = any(
            bool(np.isnan(np.asarray(v)).any()) for v in x
        ) or bool(np.isnan(P).any())
        eig = np.linalg.eigvalsh(0.5 * (P + P.T)) if not nan_state else None
        return {
            "nan": nan_state,
            "p_min_eig": float(eig.min()) if eig is not None else float("nan"),
            "p_max_eig": float(eig.max()) if eig is not None else float("nan"),
            "map_size": int(jax.device_get(hm.map_size(self.map))),
            "map_dropped": int(jax.device_get(jnp.sum(self.map.dropped))),
            "truncated_points": self.truncated_points,
            "scans": len(self.trajectory),
            "imu_initialized": not self.imu_need_init,
            "map_built": self.map_built,
        }

    def measure_stage_times(self) -> dict:
        """Slope-method device timings of the search / incremental / delete
        stage groups at this pipeline's shapes against its live map — the
        honest sources for the reference-schema timing CSV columns (see
        utils.stage_timing for methodology)."""
        from .utils.stage_timing import measure_stage_times

        return measure_stage_times(self)

    def pose_covariance(self) -> np.ndarray:
        """6x6 pose covariance, rotation block first — the reference's
        odometry covariance layout (publish_odometry reorders P's pos/rot
        blocks, laserMapping.cpp:596-606)."""
        P = np.asarray(jax.device_get(self.P))
        out = np.zeros((6, 6))
        out[:3, :3] = P[3:6, 3:6]  # rot
        out[3:, 3:] = P[0:3, 0:3]  # pos
        out[:3, 3:] = P[3:6, 0:3]
        out[3:, :3] = P[0:3, 3:6]
        return out

    def last_cloud_world_dense(self):
        """Dense world-frame cloud (+intensity) of the last processed scan —
        the reference's laserCloudWorld in dense mode (publish_frame_world,
        laserMapping.cpp:504-529): every deskewed return transformed by the
        scan's posterior pose, NOT the voxel-downsampled update cloud.  Syncs
        the device; meant for the pcd_save_en accumulation path."""
        if self.last_pts_body is None:
            return (np.zeros((0, 3), np.float32), np.zeros(0, np.float32))
        pts = meas.body_to_world(self.x, self.last_pts_body)
        mask = np.asarray(jax.device_get(self.last_pts_body_mask))
        return (
            np.asarray(jax.device_get(pts))[mask],
            np.asarray(jax.device_get(self.last_pts_body_intensity))[mask],
        )

    def push_lidar(self, stamp, pts, pt_time, intensity=None,
                   preprocess_time=0.0):
        self.sync.push_lidar(float(stamp), pts, pt_time, intensity,
                             preprocess_time)

    def push_imu(self, t, acc, gyr):
        self.sync.push_imu(float(t), acc, gyr)

    def spin_once(self) -> bool:
        """Process at most one synced packet.  Returns True if one was run."""
        pkt = self.sync.pop_packet()
        if pkt is None:
            return False
        self.process_packet(pkt)
        return True

    def _pack_buf(self, pkt: ScanPacket, last_end_rel, pcl_end_rel,
                  ekf_inited, do_update, n_max=None):
        """One flat f32 feed buffer: [scalars(8) | imu(M,7) | pts(N*3) |
        time(N) | intensity(N)] — contiguous field blocks, see _build_step.

        The buffer is a fresh np.zeros each scan ON PURPOSE: jax zero-copies
        host f32 buffers on some backends (CPU aliases the numpy memory
        outright), so reusing a pooled buffer would mutate the input of a
        still-in-flight async step.  calloc'd zero pages cost ~0.02 ms even
        at ouster pads; the former cost center was the stride-5 record
        scatter (~0.3 ms), which the contiguous field layout removes."""
        if n_max is None:
            n_max = self.cfg.n_points_max
        m_max = self.cfg.n_imu_max
        n = min(len(pkt.pts), n_max)
        m = min(len(pkt.imu_t), m_max)
        buf = np.zeros(8 + m_max * 7 + n_max * 5, np.float32)
        buf[0:8] = (self.acc_scale, last_end_rel, pcl_end_rel, n, m,
                    1.0 if ekf_inited else 0.0, 1.0 if do_update else 0.0,
                    0.0)
        imu = buf[8:8 + m_max * 7].reshape(m_max, 7)
        imu[:m, 0] = pkt.imu_t[:m] - pkt.lidar_beg_time
        imu[:m, 1:4] = pkt.imu_acc[:m]
        imu[:m, 4:7] = pkt.imu_gyr[:m]
        o = 8 + m_max * 7
        pts = np.ascontiguousarray(pkt.pts[:n], np.float32)
        buf[o:o + n * 3] = pts.reshape(-1)
        buf[o + n_max * 3:o + n_max * 3 + n] = pkt.pt_time[:n]
        if pkt.intensity is not None:
            buf[o + n_max * 4:o + n_max * 4 + n] = pkt.intensity[:n]
        return buf

    def process_packet(self, pkt: ScanPacket):
        t0 = time.perf_counter()
        cfg = self.cfg
        diag = StepDiag(n_raw=len(pkt.pts), preprocess_time=pkt.preprocess_time)

        if self.first_lidar_time is None:
            self.first_lidar_time = pkt.lidar_beg_time

        # ---- IMU static init phase (IMU_Processing.hpp:356-380) ----
        if self.imu_need_init:
            if len(pkt.imu_t):
                self.imu_stats = imu_mod.update_stats(
                    self.imu_stats, pkt.imu_acc, pkt.imu_gyr
                )
                if self.imu_stats.n > cfg.max_ini_count:
                    self.x, self.P = imu_mod.make_init_state(
                        self.imu_stats, cfg.extrinsic_R_mat,
                        cfg.extrinsic_T_vec, self.dtype,
                    )
                    self.acc_scale = float(
                        st.G_M_S2 / np.linalg.norm(self.imu_stats.mean_acc)
                    )
                    self.imu_need_init = False
            self.last_lidar_end_time = pkt.lidar_end_time
            return

        last_end_rel = self.last_lidar_end_time - pkt.lidar_beg_time
        pcl_end_rel = pkt.lidar_end_time - pkt.lidar_beg_time
        ekf_inited = (
            pkt.lidar_beg_time - self.first_lidar_time
        ) >= cfg.init_time
        do_update = self.map_built
        pad = self._pad_for(len(pkt.pts))
        truncated = max(0, len(pkt.pts) - pad)
        if truncated:
            self.truncated_points += truncated
            if not self._warned_truncation:
                self._warned_truncation = True
                import warnings

                warnings.warn(
                    f"scan of {len(pkt.pts)} points exceeds the largest pad "
                    f"bucket {pad}; {truncated} points dropped (this is "
                    "counted in health_check()['truncated_points'] — raise "
                    "Config.n_points_max or add a pad bucket)")
        diag.n_truncated = truncated
        buf = self._pack_buf(pkt, last_end_rel, pcl_end_rel, ekf_inited,
                             do_update, n_max=pad)

        # NO host<->device syncs below: the step is dispatched asynchronously
        # and every readback (trajectory pose, diagnostics, world cloud) is a
        # lazy device-array handle materialized on demand.
        dev_buf = (jnp.asarray(buf) if self._rep_sharding is None
                   else jax.device_put(buf, self._rep_sharding))
        (self.x, self.P, self.map, self.imu_carry, self.lm_state, clouds, d
         ) = self._step_fn(
            self.x, self.P, self.map, self.imu_carry, self.Q,
            dev_buf, *self.lm_state,
        )
        if not self.map_built:
            # one-time sync during startup: did the first scan seed the map?
            self.map_built = int(d["n_down"]) > 5

        self.last_lidar_end_time = pkt.lidar_end_time
        # device handles; np.asarray() to fetch (publisher surface:
        # /cloud_registered and /cloud_registered_body analogs)
        self.last_pts_world = clouds["world"]
        self.last_pts_world_mask = clouds["world_mask"]
        self.last_pts_world_intensity = clouds["world_intensity"]
        self.last_pts_body = clouds["body"]
        self.last_pts_body_mask = clouds["body_mask"]
        self.last_pts_body_intensity = clouds["body_intensity"]

        diag.n_effective = d["n_eff"]
        diag.iterations = d["iters"]
        diag.n_down = d["n_down"]
        diag.map_size = d["map_size"]
        if cfg.stage_timing:
            # real per-scan latency: force a readback that data-depends on
            # the step's outputs (block_until_ready lies on the tunnel
            # backend); costs the pipelining this mode explicitly trades away
            float(np.asarray(jax.device_get(self.x.pos))[0])
            int(jax.device_get(d["map_size"]))
        diag.total_time = time.perf_counter() - t0
        self.diags.append(diag)
        self.trajectory.append((pkt.lidar_end_time, self.x.pos, self.x.rot))
        if cfg.runtime_pos_log:
            self.state_log.append((pkt.lidar_beg_time, self.x))
