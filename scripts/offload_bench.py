"""Out-of-core step microbenchmark: 32k-row working sets over a 2M-row
packed host store, device-resident cache with coherent (overlapping) cuts.

Counterpart of the reference's paging loop timing (train_post.py:431-485).
Prints per-step ms for cold (full fetch) and warm (delta fetch) steps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.models import gaussians as gm
    from hlod_gaussians_tpu.train import offload
    from hlod_gaussians_tpu.utils.camera import make_camera

    cap = 1 << 21                  # 2M-row host store
    ws = 1 << 15                   # 32k-row working set
    W = H = 512

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(ws, 3)).astype(np.float32)
    pts[:, 2] += 6.0
    st_small = gm.create_from_points(pts, rng.random((ws, 3)).astype(np.float32),
                                     capacity=ws, sh_degree=1, opacity_init=0.6)
    # packed host store: real rows tiled across the 2M capacity
    d = offload.pack_store(st_small)
    data = np.tile(d, (cap // ws, 1))
    store = offload.PackedStore(data, sh_degree=1)

    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=16,
                           max_dup=1 << 19, tight_binning=True)
    tr = offload.DeviceResidentTrainer(
        store, budget=ws, cfg=cfg, width=W, height=H, k_max=256,
        scene_extent=4.0)
    gt = jnp.full((3, H, W), 0.4)

    def step(rows):
        t0 = time.perf_counter()
        loss, n_vis = tr.step(rows, cam.world_view, cam.full_proj,
                              cam.campos, cam.tan_fovx, cam.tan_fovy, gt,
                              jnp.zeros(3))
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) * 1e3

    base = np.arange(ws, dtype=np.int32)
    t_compile = step(base)
    print(f"first (compile): {t_compile:.0f} ms", flush=True)

    cold = step(base + ws)         # full working set swap
    print(f"cold step (32k fetch + 32k evict): {cold:7.1f} ms", flush=True)

    warm_ts = []
    off = ws
    for i in range(8):
        off += ws // 16            # 2k-row drift per view (coherent walk)
        warm_ts.append(step((base + off) % cap))
    print(f"warm step (2k delta): {np.mean(warm_ts):7.1f} ms "
          f"(min {np.min(warm_ts):.1f})", flush=True)

    seq_est = cold
    print(f"r01 baseline: 1040 ms/step; cold {cold:.0f} ms, "
          f"warm {np.mean(warm_ts):.0f} ms", flush=True)


if __name__ == "__main__":
    main()
