"""Multi-process dry run: the full DP + chunk-parallel train step over a
process-spanning mesh on the CPU backend.

Per-process main; launch N of these (see tests/test_distributed.py or
scripts/run_multihost_dryrun.sh). Process 0 writes MULTIHOST json with a
virtual scaling-efficiency number: per-step time of the N-process global
batch vs the same program on a 1-device batch (weak scaling: B = n_data
views per step, so efficiency = t_1 / t_N with N
times the work).

Usage: python multihost_dryrun.py <process_id> <num_processes>
         [coordinator] [devices_per_proc] [out_json] [views_per_device]

The launcher passes views_per_device so baseline (1x1) and multi (NxD) runs
process the SAME global batch — efficiency then measures distribution
overhead rather than oversubscription of the shared test CPU.
"""

import json
import os
import sys
import time


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3] if len(sys.argv) > 3 else "127.0.0.1:29531"
    ndev = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    out_json = sys.argv[5] if len(sys.argv) > 5 else ""
    views_per_dev = int(sys.argv[6]) if len(sys.argv) > 6 else 1

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev} "
        + os.environ.get("XLA_FLAGS", ""))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax
    jax.config.update("jax_platforms", "cpu")

    from hlod_gaussians_tpu.parallel import distributed as dist
    dist.initialize(coord, nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.parallel import chunk_parallel as cpar
    from hlod_gaussians_tpu.parallel import data_parallel as dp
    from hlod_gaussians_tpu.train import flat
    from hlod_gaussians_tpu.utils.camera import make_camera

    assert jax.process_count() == nproc
    mesh = dist.make_global_mesh()          # (nproc*ndev, 1)
    n_data = mesh.shape["data"]

    # workload sized so per-view compute dominates per-step dispatch and
    # collective overhead (64 gaussians at 32^2 measured pure overhead:
    # every step was ~5 ms of launch + Gloo latency regardless of devices;
    # 192^2/8k still left ~100 ms of Gloo psum+barrier per step = 17% of
    # the 4-core step — 256^2/16k is the smallest realistic chunk-training
    # shape where the ratio reflects compute, not transport fixed costs)
    width = height = 256
    cfg = RasterizerConfig(tile_w=16, tile_h=8, max_dup=1 << 17)
    rng = np.random.default_rng(0)
    n_pts = 16384
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    state = gm.create_from_points(pts,
                                  rng.random((n_pts, 3)).astype(np.float32),
                                  capacity=n_pts, sh_degree=1,
                                  opacity_init=0.7)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, width, height)

    ts = flat.init_flat_train(state)
    # replicate parameters globally (gradient psum crosses hosts over "DCN")
    ts = jax.tree.map(lambda x: dist.replicate(mesh, np.asarray(x)), ts)

    b_local = ndev * views_per_dev
    def lview(x):
        return dist.global_view_batch(
            mesh, np.stack([np.asarray(x)] * b_local))

    wv, fp, cp = lview(cam.world_view), lview(cam.full_proj), lview(cam.campos)
    tfx, tfy = lview(cam.tan_fovx), lview(cam.tan_fovy)
    gts = dist.global_view_batch(
        mesh, np.zeros((b_local, 3, height, width), np.float32))
    eidx = dist.global_view_batch(mesh, np.zeros((b_local,), np.int32))

    step_args = dict(opt=OptimizationConfig(), cfg=cfg, width=width,
                     height=height, k_max=64, sh_degree=1, use_exposure=False)
    new_ts, loss = dp.dp_train_step(ts, wv, fp, cp, tfx, tfy, gts,
                                    jnp.zeros(3), eidx, 5.0, **step_args)
    jax.block_until_ready(new_ts.step)

    iters = 8
    t0 = time.perf_counter()
    for _ in range(iters):
        new_ts, loss = dp.dp_train_step(new_ts, wv, fp, cp, tfx, tfy, gts,
                                        jnp.zeros(3), eidx, 5.0, **step_args)
    jax.block_until_ready(new_ts.step)
    t_global = (time.perf_counter() - t0) / iters

    # chunk-parallel + densify across the global mesh
    k = n_data
    chunk_states = []
    for i in range(k):
        rngi = np.random.default_rng(i)
        p2 = rngi.normal(size=(32, 3)).astype(np.float32)
        p2[:, 2] += 4.0
        s = gm.create_from_points(p2, rngi.random((32, 3)).astype(np.float32),
                                  capacity=64, sh_degree=1, opacity_init=0.7)
        chunk_states.append(flat.init_flat_train(s))
    bts = cpar.stack_states(chunk_states)
    bts = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
            np.asarray(x)[pid * (k // nproc):(pid + 1) * (k // nproc)]),
        bts)

    def grep(x):
        return dist.global_view_batch(
            mesh, np.stack([np.asarray(x)] * (k // nproc)))

    bts2, auxb = cpar.chunk_parallel_step(
        bts, grep(cam.world_view), grep(cam.full_proj), grep(cam.campos),
        grep(cam.tan_fovx), grep(cam.tan_fovy),
        dist.global_view_batch(
            mesh, np.zeros((k // nproc, 3, height, width), np.float32)),
        jnp.zeros(3),
        dist.global_view_batch(mesh, np.zeros((k // nproc,), np.int32)),
        5.0, cfg=cfg, width=width, height=height, k_max=64, sh_degree=1,
        use_exposure=False)
    jax.block_until_ready(bts2.step)
    bts3, n_split = cpar.chunk_parallel_densify(bts2, 5.0,
                                                opt=OptimizationConfig())
    jax.block_until_ready(bts3.step)

    if pid == 0:
        result = dict(ok=True, n_processes=nproc, devices_per_process=ndev,
                      n_data=n_data, global_batch=b_local * nproc,
                      dp_step_ms=round(t_global * 1e3, 2),
                      chunk_parallel_ok=True, densify_ok=True)
        print("MULTIHOST", json.dumps(result), flush=True)
        if out_json:
            with open(out_json, "w") as f:
                json.dump(result, f)
    print(f"proc {pid}: done", flush=True)


if __name__ == "__main__":
    main()
