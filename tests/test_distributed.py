"""Multi-process jax.distributed execution (the last BASELINE.md north star:
map sharded across processes, psum'd Gauss-Newton reductions over the job).

Two OS processes x 4 virtual CPU devices each form one 8-device job via
``parallel.init_distributed`` (the jax.distributed bring-up the reference has
no analog for — it is strictly single-host, SURVEY.md §2.8).  Both processes
run the full sharded Pipeline over the same deterministic sim stream; the
test asserts:

* both processes produce IDENTICAL trajectories (the state is replicated —
  any divergence means the collective reductions are not exact);
* the 2-process trajectory matches a single-process single-device f64 run of
  the same stream (reduction-order rounding only);
* a checkpoint written from the 2-process job (global map assembled with a
  process allgather) restores into a fresh 2-process pipeline bit-exactly —
  map content, estimator state, and the next pose after resume.

Run directly as a worker:  python tests/test_distributed.py <pid> <nproc> <port>
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

N_PROC = 2
DEV_PER_PROC = 4
N_SCANS = 12


def _sim_stream():
    from fast_lio_tpu import sim as simlib

    return simlib.generate(simlib.SimConfig(
        duration=N_SCANS * 0.1 + 0.25, n_rings=8, n_azimuth=160,
        range_noise=0.01, imu_acc_noise=0.01, imu_gyr_noise=0.001,
    ))


def _make_cfg():
    from fast_lio_tpu.config import Config, LidarType

    return Config(
        lidar_type=LidarType.AVIA,
        n_points_max=2048, n_ds_max=1024, n_imu_max=16,
        map_h_log2=10, map_bucket_slots=32,
        filter_size_surf=0.3, filter_size_map=0.3,
        det_range=40.0, cube_side_length=300.0,
        knn_backend="xla", compute_dtype="float64",
    )


def _feed(pipe, data):
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


def _worker(pid: int, nproc: int, port: int, outdir: str):
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count="
                                 f"{DEV_PER_PROC}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from fast_lio_tpu import parallel
    from fast_lio_tpu.map import hash_map as hm
    from fast_lio_tpu.pipeline import Pipeline
    from fast_lio_tpu.utils import checkpoint as ckpt

    mesh = parallel.init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * DEV_PER_PROC
    assert len(jax.local_devices()) == DEV_PER_PROC

    data = _sim_stream()
    cfg = _make_cfg()
    pipe = Pipeline(cfg, mesh=mesh)
    _feed(pipe, data)
    traj = pipe.get_trajectory()
    hc = pipe.health_check()

    # ---- checkpoint round trip across the job ----
    # per-process path (concurrent writes to one file would race); the driver
    # asserts both files hold identical global content
    ck_path = Path(outdir) / f"dist_ckpt_{pid}.npz"
    ckpt.save_pipeline(ck_path, pipe)  # allgathers the global map
    pipe2 = Pipeline(cfg, mesh=mesh)
    ckpt.load_pipeline(ck_path, pipe2)
    same_map_size = int(jax.device_get(hm.map_size(pipe2.map))) == hc["map_size"]
    # run ONE more scan on both original and restored: must match bit-exactly
    extra = _sim_stream()
    for p in (pipe, pipe2):
        k = N_SCANS - 1  # re-use the last scan content as a fresh packet
        stamp = extra.scan_stamps[k] + 0.1
        for j in range(len(extra.imu_t)):
            if extra.scan_stamps[k] < extra.imu_t[j] <= stamp + 0.1 + 1e-9:
                p.push_imu(extra.imu_t[j] + 0.1, extra.imu_acc[j],
                           extra.imu_gyr[j])
        p.push_lidar(stamp, extra.scans[k], extra.scan_pt_times[k])
        while p.spin_once():
            pass
    pos_a = np.asarray(jax.device_get(pipe.x.pos))
    pos_b = np.asarray(jax.device_get(pipe2.x.pos))
    resume_exact = bool(np.array_equal(pos_a, pos_b))

    out = {
        "pid": pid,
        "traj": [[t, list(map(float, p)), list(map(float, q))]
                 for t, p, q in traj],
        "map_size": hc["map_size"],
        "nan": hc["nan"],
        "ckpt_map_size_ok": bool(same_map_size),
        "resume_exact": resume_exact,
    }
    Path(outdir, f"proc{pid}.json").write_text(json.dumps(out))


@pytest.mark.skipif(os.environ.get("FAST_LIO_SKIP_DISTRIBUTED") == "1",
                    reason="explicitly disabled")
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu via jax.config
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, str(pid), str(N_PROC), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(N_PROC)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"

    res = [json.loads((tmp_path / f"proc{i}.json").read_text())
           for i in range(N_PROC)]
    assert not res[0]["nan"]
    assert res[0]["ckpt_map_size_ok"] and res[1]["ckpt_map_size_ok"]
    assert res[0]["resume_exact"] and res[1]["resume_exact"]

    # both processes saw the identical replicated trajectory
    t0 = np.asarray([r[1] for r in res[0]["traj"]])
    t1 = np.asarray([r[1] for r in res[1]["traj"]])
    assert len(t0) >= N_SCANS - 3
    np.testing.assert_array_equal(t0, t1)

    # both processes assembled the identical GLOBAL checkpoint
    z0 = np.load(tmp_path / "dist_ckpt_0.npz")
    z1 = np.load(tmp_path / "dist_ckpt_1.npz")
    assert set(z0.files) == set(z1.files)
    for k in ("map_packed", "map_dropped", "pos", "rot", "P"):
        np.testing.assert_array_equal(z0[k], z1[k])

    # equivalence vs a single-process single-device f64 run (reduction-order
    # rounding only; same tolerance class as tests/test_sharding.py)
    from fast_lio_tpu.pipeline import Pipeline

    data = _sim_stream()
    ref = Pipeline(_make_cfg())
    _feed(ref, data)
    ref_traj = ref.get_trajectory()
    rp = np.stack([p for _, p, _ in ref_traj])
    assert rp.shape == t0.shape
    np.testing.assert_allclose(t0, rp, atol=1e-5)


if __name__ == "__main__":
    _worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
