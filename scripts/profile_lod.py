"""Stage profile of render_lod at 1M nodes / 1080p: cut, compaction,
interpolation, preprocess, binning, blend — find the fixed costs."""

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

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.models.gaussians import NODE_PARENT, NODE_DEPTH
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, height = 1920, 1080
    c = 1 << 20
    budget = 1 << 16
    rng = np.random.default_rng(0)

    # synthetic 1M-node forest with plausible parent links
    pos = rng.normal(size=(c, 3)).astype(np.float32) * 10.0
    pos[:, 2] += 30.0
    scales = np.exp(rng.normal(size=(c, 3)) * 0.3 - 3.0).astype(np.float32)
    quats = rng.normal(size=(c, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.3, 0.9, c).astype(np.float32)
    shs = (rng.normal(size=(c, 1, 3)) * 0.3).astype(np.float32)
    nodes = np.zeros((c, 6), np.int32)
    nodes[:, NODE_PARENT] = rng.integers(0, c, c)
    nodes[1:, NODE_DEPTH] = 1
    nodes[:, 0] = 2  # child count-ish
    alive = np.ones(c, bool)

    P = {k: jnp.asarray(v) for k, v in dict(
        pos=pos, scales=scales, quats=quats, ops=ops, shs=shs,
        nodes=nodes, alive=alive).items()}
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 19, tight_binning=True)
    target = render_mod.tau_to_threshold(6.0, float(cam.tan_fovx), width)

    def timeit(label, fn, *a, iters=20):
        f = jax.jit(fn) if not hasattr(fn, "lower") else fn
        out = jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*a)
        jax.block_until_ready(out)
        print(f"{label}: {(time.perf_counter()-t0)/iters*1e3:7.2f} ms",
              flush=True)
        return out

    zdir = cam.world_view[:3, 2]

    def stage_cut(pos, scales, nodes, alive):
        return cut_mod.expand_to_size_dynamic(
            nodes, pos, jnp.max(scales, axis=-1), alive, cam.campos, zdir,
            target)

    cut = timeit("cut (expand_to_size_dynamic)", stage_cut,
                 P["pos"], P["scales"], P["nodes"], P["alive"])
    print(f"  n_selected={int(jnp.sum(cut.render_mask))}")

    pc = jax.block_until_ready(cut_mod.build_parent_cache(
        P["nodes"], P["pos"], jnp.max(P["scales"].T, axis=0)))

    def stage_cut_pc(pos, scales, nodes, alive, pc):
        return cut_mod.expand_to_size_dynamic(
            nodes, pos, jnp.max(scales.T, axis=0), alive, cam.campos, zdir,
            target, pc)

    cut_pc = timeit("cut with parent cache", stage_cut_pc,
                    P["pos"], P["scales"], P["nodes"], P["alive"], pc)
    assert bool(jnp.all(cut_pc.render_mask == cut.render_mask))
    np.testing.assert_allclose(np.asarray(cut_pc.ts), np.asarray(cut.ts),
                               atol=1e-6)

    def stage_sort(cut):
        mask = cut.render_mask
        neg_size = -jnp.where(jnp.isfinite(cut.size), cut.size, 3.4e38)
        _, _, idx = jax.lax.sort(
            ((~mask).astype(jnp.int32), neg_size,
             jnp.arange(c, dtype=jnp.int32)), num_keys=2)
        return idx[:budget]

    idx = timeit("compaction sort", stage_sort, cut)

    def stage_interp(pos, scales, quats, ops, shs, nodes, cut, idx):
        idx_c = jnp.clip(idx, 0, c - 1)
        parent = jnp.clip(nodes[idx_c, NODE_PARENT], 0, c - 1)
        ts_sel = cut.ts[idx_c]
        params = dict(means3d=pos, scales=scales, quats=quats,
                      opacities=ops, shs=shs)
        return cut_mod.interpolate_with_parents(params, idx_c, parent,
                                                ts_sel)

    interp = timeit("interpolate_with_parents", stage_interp,
                    P["pos"], P["scales"], P["quats"], P["ops"], P["shs"],
                    P["nodes"], cut, idx)

    # full render_lod through the public API
    def full(pos, scales, quats, ops, shs, nodes, alive):
        out, n = render_mod.render_lod(
            pos, scales, quats, ops, shs, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=cfg, k_max=256)
        return out.image

    timeit("render_lod full", full, P["pos"], P["scales"], P["quats"],
           P["ops"], P["shs"], P["nodes"], P["alive"], iters=10)

    def full_pc(pos, scales, quats, ops, shs, nodes, alive, pc):
        out, n = render_mod.render_lod(
            pos, scales, quats, ops, shs, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None, pc,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=cfg, k_max=256)
        return out.image

    timeit("render_lod full + pcache", full_pc, P["pos"], P["scales"],
           P["quats"], P["ops"], P["shs"], P["nodes"], P["alive"], pc,
           iters=10)

    # flat render of the same budget-many gaussians for comparison
    sel = np.arange(budget)
    def flat(pos, scales, quats, ops, shs):
        out = render_mod.render_arrays(
            pos[:budget], scales[:budget], quats[:budget], ops[:budget],
            shs[:budget], jnp.ones((budget,), bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), sh_degree=0,
            width=width, height=height, cfg=cfg, k_max=256)
        return out.image

    timeit("flat render same budget", flat, P["pos"], P["scales"],
           P["quats"], P["ops"], P["shs"], iters=10)


if __name__ == "__main__":
    main()
