"""Isolate per-frame costs of the LOD streaming loop on the 1M-node tree."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/lodtree.npz"


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    d = np.load(CACHE)
    pos, scale, quat, op, sh, nodes = (
        jnp.asarray(d["pos"]), jnp.asarray(d["scale"]), jnp.asarray(d["quat"]),
        jnp.asarray(np.clip(d["opacity"], 0, 1)), jnp.asarray(d["sh"]),
        jnp.asarray(d["nodes"]))
    m = nodes.shape[0]
    alive = jnp.ones((m,), bool)
    width, height = 1920, 1080
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 20, tight_binning=True)

    def cam_at(i):
        a = 0.02 * i
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                      [-np.sin(a), 0, np.cos(a)]], np.float32)
        return make_camera(R, np.zeros(3), fovx=1.2, fovy=0.8,
                           width=width, height=height)

    cams = [cam_at(i) for i in range(26)]
    jax.block_until_ready([c.world_view for c in cams])

    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))
    target = float(render_mod.tau_to_threshold(15.0, float(cams[0].tan_fovx),
                                               width))
    budget = 1 << 16

    def frame(cam, md):
        zdir = cam.world_view[:3, 2]
        cut = cut_mod.expand_to_size_dynamic(
            nodes, pos, jnp.max(scale.T, axis=0), alive, cam.campos, zdir,
            target, pcache, use_frustum=False)
        out, n = render_mod.render_lod(
            pos, scale, quat, op, sh, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None, pcache, cut,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=dataclasses.replace(cfg, max_dup=md), k_max=512,
            use_frustum=False)
        return out, n

    for md_pow in (18, 19):
        md = 1 << md_pow
        out, n = frame(cams[0], md)
        jax.block_until_ready(out.image)
        print(f"md=2^{md_pow}: n_sel={int(n)} truncated={bool(out.truncated)}")
        t0 = time.perf_counter()
        for i in range(10):
            out, n = frame(cams[6 + (i % 20)], md)
        jax.block_until_ready(out.image)
        dt = (time.perf_counter() - t0) / 10
        print(f"  no-feedback loop: {dt * 1e3:7.2f} ms/frame "
              f"({width * height / dt / 1e6:.1f} Mpix/s)")

        # with one-frame-lag scalar fetches (as render_lod_stream does)
        pending = None
        t0 = time.perf_counter()
        for i in range(10):
            out, n = frame(cams[6 + (i % 20)], md)
            if pending is not None:
                _ = int(pending[0]); _ = bool(pending[1])
            pending = (n, out.truncated)
        jax.block_until_ready(out.image)
        dt = (time.perf_counter() - t0) / 10
        print(f"  lagged-feedback loop: {dt * 1e3:7.2f} ms/frame")

        # async D2H copy started at dispatch, fetched one frame later
        pending = None
        t0 = time.perf_counter()
        for i in range(10):
            out, n = frame(cams[6 + (i % 20)], md)
            n.copy_to_host_async()
            out.truncated.copy_to_host_async()
            if pending is not None:
                _ = int(pending[0]); _ = bool(pending[1])
            pending = (n, out.truncated)
        jax.block_until_ready(out.image)
        dt = (time.perf_counter() - t0) / 10
        print(f"  async-copy lagged loop: {dt * 1e3:7.2f} ms/frame")

        # feedback every 8th frame only
        t0 = time.perf_counter()
        for i in range(16):
            out, n = frame(cams[6 + (i % 20)], md)
            if i % 8 == 7:
                _ = int(n); _ = bool(out.truncated)
        jax.block_until_ready(out.image)
        dt = (time.perf_counter() - t0) / 16
        print(f"  every-8th-frame feedback: {dt * 1e3:7.2f} ms/frame")


if __name__ == "__main__":
    main()
