"""Stage profile of render_lod on the lod_bench 1M-node tree (cached to
/tmp/lodtree.npz so the 1M hierarchy build runs once)."""

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

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.utils.camera import make_camera

    if not os.path.exists(CACHE):
        from hlod_gaussians_tpu.hierarchy import build as hb
        rng = np.random.default_rng(0)
        n_leaves = 1 << 19
        pts = rng.normal(size=(n_leaves, 3)).astype(np.float32) * 10.0
        pts[:, 2] += 30.0
        scales = np.exp(rng.normal(size=(n_leaves, 3)) * 0.3 - 3.2
                        ).astype(np.float32)
        quats = rng.normal(size=(n_leaves, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
        ops = rng.uniform(0.3, 0.9, n_leaves).astype(np.float32)
        shs = rng.normal(size=(n_leaves, 1, 3)).astype(np.float32) * 0.3
        h = hb.build_hierarchy(pts, scales, quats, ops, shs)
        np.savez(CACHE, pos=h.pos, scale=h.scale, quat=h.quat,
                 opacity=h.opacity, sh=h.sh, nodes=h.nodes)
        print("tree built + cached", flush=True)
    z = np.load(CACHE)
    width, height = 1920, 1080
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 18, tight_binning=True)
    pos = jnp.asarray(z["pos"])
    scale = jnp.asarray(z["scale"])
    quat = jnp.asarray(z["quat"])
    op = jnp.asarray(np.clip(z["opacity"], 0, 1))
    sh = jnp.asarray(z["sh"])
    nodes = jnp.asarray(z["nodes"])
    m = nodes.shape[0]
    alive = jnp.ones((m,), bool)
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))

    def timeit(label, fn, *a, iters=10):
        out = jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms",
              flush=True)
        return out

    tau = 15.0
    target = float(render_mod.tau_to_threshold(tau, float(cam.tan_fovx),
                                               width))
    zdir = cam.world_view[:3, 2]
    max_scale = jnp.max(scale.T, axis=0)

    cutf = jax.jit(lambda: cut_mod.expand_to_size_dynamic(
        nodes, pos, max_scale, alive, cam.campos, zdir, target, pcache,
        use_frustum=False))
    cut = timeit("cut+pcache", cutf)
    n_sel = int(jnp.sum(cut.render_mask))
    print(f"  n_selected={n_sel}")

    budget = 1 << 16

    def full():
        out, n = render_mod.render_lod(
            pos, scale, quat, op, sh, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None, pcache,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=cfg, k_max=512, use_frustum=False)
        return out.image, out.truncated

    img, trunc = timeit("render_lod budget=64k md=256k", full)
    print(f"  truncated={bool(trunc)}")

    # flat render of exactly the interpolated cut (what the blend costs)
    from hlod_gaussians_tpu.models.gaussians import NODE_PARENT
    mask = cut.render_mask
    neg_size = -jnp.where(jnp.isfinite(cut.size), cut.size, 3.4e38)
    _, _, idx = jax.lax.sort(
        ((~mask).astype(jnp.int32), neg_size,
         jnp.arange(m, dtype=jnp.int32)),
        num_keys=2)
    idx = jnp.clip(idx[:budget], 0, m - 1)
    parent = jnp.clip(nodes[idx, NODE_PARENT], 0, m - 1)
    interp = cut_mod.interpolate_with_parents(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        idx, parent, cut.ts[idx])
    lane_ok = jnp.arange(budget) < n_sel
    qn = interp["quats"] / jnp.linalg.norm(
        interp["quats"], axis=-1, keepdims=True).clip(1e-12)

    def flat():
        out = render_mod.render_arrays(
            interp["means3d"], interp["scales"], qn,
            interp["opacities"], interp["shs"], lane_ok,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), cut.ts[idx],
            jnp.maximum(cut.kids[idx], 1),
            sh_degree=0, width=width, height=height, cfg=cfg, k_max=512,
            use_lod=True)
        return out.image

    timeit("flat render of the cut", flat)


if __name__ == "__main__":
    main()
