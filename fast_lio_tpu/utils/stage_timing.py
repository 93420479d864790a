"""Opt-in per-stage device timers for the timing CSV (honest numbers only).

The reference brackets each stage with omp_get_wtime inside its serial loop
(laserMapping.cpp:879-886,955-977) and writes per-frame search / incremental
/ delete times to fast_lio_time_log.csv.  The TPU step is ONE fused XLA
program — per-frame stage brackets would require splitting it and forcing a
host sync per stage, destroying the performance being measured.  And on the
tunnel backend ``block_until_ready`` does not actually block, so naive
bracketing reports dispatch time, not compute.

Instead, stage costs are measured by the slope method at the RUN'S OWN
shapes and map content: each stage group is looped N_LO and N_HI times
inside one jit with a forced host readback; the per-iteration cost is the
slope between the two, which cancels the tunnel round trip exactly.  The
measured means populate the CSV's search/incremental/delete columns (a
run-level device truth, flat across rows by construction); the total-time
column is the per-scan wall latency measured with a real readback sync when
``Config.stage_timing`` is on.  Columns that would otherwise be zeros now
carry measured numbers the reference's analysis tooling can read.

Stage mapping to the reference's columns:
  search time      -> one measurement evaluation (kNN search + plane fit + H
                      assembly), the body of h_share_model (laserMapping.cpp:
                      638-754) — per update iteration
  incremental time -> insert_decisions + insert (map_incremental,
                      laserMapping.cpp:427-474)
  delete time      -> prune_outside (the Delete_Point_Boxes analog,
                      laserMapping.cpp:275) — fires only on cube moves
"""
from __future__ import annotations

import time
from functools import partial

import numpy as np


def _slope(fn_builder, args, n_lo=4, n_hi=24, reps=4):
    """Per-iteration seconds of fn_builder(n)(*args) via two loop lengths."""
    import jax

    t = {}
    for n in (n_lo, n_hi):
        f = jax.jit(fn_builder(n))
        out = f(*args)  # compile + warm
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        t[n] = best
    return max((t[n_hi] - t[n_lo]) / (n_hi - n_lo), 0.0)


def measure_stage_times(pipe) -> dict:
    """Slope-measured per-stage device seconds at ``pipe``'s shapes, against
    its live map.  Returns {"search": s, "incremental": s, "delete": s}.

    Call after the map is populated (e.g. at end of run); costs a few dozen
    extra step-sized device programs.
    """
    import jax
    import jax.numpy as jnp

    from ..filter import process  # noqa: F401 (kept for shape parity)
    from ..map import hash_map as hm
    from ..ops import measurement as meas
    from .. import state as st

    cfg, map_cfg, m = pipe.cfg, pipe.map_cfg, pipe.map
    dtype = pipe.dtype
    N = cfg.n_ds_max
    rng = np.random.default_rng(0)
    pts_ds = jnp.asarray(rng.uniform(-15, 15, size=(N, 3)), dtype)
    ds_mask = jnp.ones(N, bool)
    x = jax.device_get(pipe.x)
    x = st.State(*[jnp.asarray(v, dtype) if v.dtype != bool else v
                   for v in x])

    def loop(body, n, init):
        return jax.lax.fori_loop(0, n, body, init)

    def f_search(n):
        # the CONFIGURED backend + wide fallback, not a bare hm.knn_search —
        # on the sparse presets the wide-3x3x3 re-search is exactly where the
        # search cost differs (round-3 review item)
        from ..pipeline import make_knn_fn

        knn_fn = make_knn_fn(cfg, map_cfg, m)
        cache0 = meas.empty_cache(N, dtype)

        def body(i, acc):
            h_x, h, sel, cache, valid, _ = meas.compute_measurement(
                x._replace(pos=x.pos + acc * 1e-12), pts_ds, ds_mask,
                knn_fn, cache0, jnp.asarray(True), cfg.extrinsic_est_en,
            )
            return acc + h_x.sum() + h.sum()

        return lambda: loop(body, n, jnp.asarray(0.0, dtype))

    def f_incremental(n):
        def body(i, mm):
            add, dsf = hm.insert_decisions(
                pts_ds, ds_mask, jnp.zeros((N, 5, 3), dtype),
                jnp.zeros((N, 5), bool), jnp.asarray(True),
                cfg.filter_size_map)
            return hm.insert(mm, map_cfg, pts_ds, add, dsf)

        return lambda mm: loop(body, n, mm)

    def f_delete(n):
        lo = jnp.asarray([-0.5 * cfg.cube_side_length] * 3, dtype)
        hi = jnp.asarray([0.5 * cfg.cube_side_length] * 3, dtype)

        def body(i, mm):
            return hm.prune_outside(mm, lo + i * 0.0, hi)

        return lambda mm: loop(body, n, mm)

    return {
        "search": _slope(f_search, ()),
        "incremental": _slope(f_incremental, (m,)),
        "delete": _slope(f_delete, (m,)),
    }
