"""tau0 (masked-path) streaming ablation on the 1M-node tree.

Isolates the gap between the raw masked frame and the streaming loop:
  a) masked render, orbiting camera, NO feedback (device floor)
  b) render_lod_stream with the packed one-copy feedback
Builds /tmp/lodtree.npz via profile_lod_masked's builder if missing.
"""

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

    import jax.numpy as jnp
    import numpy as np

    if not os.path.exists(CACHE):
        from hlod_gaussians_tpu.hierarchy import build as hb
        n_leaves = 1 << 19
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(n_leaves, 3)).astype(np.float32) * 10.0
        pts[:, 2] += 30.0
        scales = np.exp(rng.normal(size=(n_leaves, 3)) * 0.3
                        - 3.2).astype(np.float32)
        quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        ops = rng.uniform(0.3, 0.9, n_leaves).astype(np.float32)
        shs = rng.normal(size=(n_leaves, 1, 3)).astype(np.float32) * 0.3
        h = hb.build_hierarchy(pts, scales, quats, ops, shs)
        np.savez(CACHE, pos=h.pos, scale=h.scale, quat=h.quat,
                 opacity=h.opacity, sh=h.sh, nodes=h.nodes)

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
    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))
    bg = jax.block_until_ready(jnp.zeros(3))

    for tau in (0.0, 15.0):
        target = float(render_mod.tau_to_threshold(
            tau, float(cams[0].tan_fovx), width))
        tgt = jax.block_until_ready(jnp.float32(max(target, 1e-9)))
        print(f"--- tau={tau:g} ---", flush=True)

        if tau == 0.0:
            # a) raw masked render, orbiting camera, no feedback at all
            def raw(i):
                out, n = render_mod.render_lod_masked(
                    pos, scale, quat, op, sh, nodes, alive,
                    cams[i].world_view, cams[i].full_proj, cams[i].campos,
                    cams[i].tan_fovx, cams[i].tan_fovy, bg, tgt,
                    None, pcache, None, itab,
                    sh_degree=0, width=width, height=height, cfg=cfg,
                    k_max=512, use_frustum=False)
                return out.image

            img = raw(0)
            jax.block_until_ready(img)
            for rep in range(2):
                t0 = time.perf_counter()
                for i in range(20):
                    img = raw(6 + i)
                jax.block_until_ready(img)
                dt = (time.perf_counter() - t0) / 20
                print(f"  masked no-feedback: {dt * 1e3:7.2f} ms/frame "
                      f"({width * height / dt / 1e6:.1f} Mpix/s)", flush=True)

        # b) the real streaming loop (packed one-copy feedback)
        st = {}

        def stream(i):
            out, _ = render_mod.render_lod_stream(
                pos, scale, quat, op, sh, nodes, alive,
                cams[i].world_view, cams[i].full_proj, cams[i].campos,
                cams[i].tan_fovx, cams[i].tan_fovy, bg, tgt, st,
                pcache=pcache, interp_table=itab,
                sh_degree=0, width=width, height=height,
                cfg=cfg, k_max=512, use_frustum=False)
            return out.image

        for i in range(6):
            img = stream(i)
        jax.block_until_ready(img)
        for rep in range(2):
            t0 = time.perf_counter()
            for i in range(20):
                img = stream(6 + i)
            jax.block_until_ready(img)
            dt = (time.perf_counter() - t0) / 20
            print(f"  stream (packed fb): {dt * 1e3:7.2f} ms/frame "
                  f"({width * height / dt / 1e6:.1f} Mpix/s)", flush=True)


if __name__ == "__main__":
    main()
