"""Stage profile of the LOD render at mid-tau scale (tau=6 bucket) on the
cached 1M-node tree: cut / compaction / interpolation / preprocess /
binning / kernel."""

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
    import functools

    import jax.numpy as jnp
    import numpy as np

    from hlod_gaussians_tpu import render as render_mod
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.hierarchy import cut as cut_mod
    from hlod_gaussians_tpu.models.gaussians import NODE_PARENT
    from hlod_gaussians_tpu.utils.camera import make_camera

    d = np.load(CACHE)
    pos, scale, quat, op, sh, nodes = (
        jnp.asarray(d["pos"]), jnp.asarray(d["scale"]), jnp.asarray(d["quat"]),
        jnp.asarray(np.clip(d["opacity"], 0, 1)), jnp.asarray(d["sh"]),
        jnp.asarray(d["nodes"]))
    m = nodes.shape[0]
    alive = jnp.ones((m,), bool)
    width, height = 1920, 1080
    tau = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=1 << 20, tight_binning=True)
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.8,
                      width=width, height=height)
    target = float(render_mod.tau_to_threshold(tau, float(cam.tan_fovx),
                                               width))
    pcache = jax.block_until_ready(cut_mod.build_parent_cache(
        nodes, pos, jnp.max(scale.T, axis=0)))

    def timeit(name, fn, *a, iters=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:7.2f} ms", flush=True)
        return out

    @jax.jit
    def do_cut():
        zdir = cam.world_view[:3, 2]
        return cut_mod.expand_to_size_dynamic(
            nodes, pos, jnp.max(scale.T, axis=0), alive, cam.campos, zdir,
            target, pcache, use_frustum=False)

    cut = timeit("cut", do_cut)
    n_sel = int(jnp.sum(cut.render_mask))
    budget = render_mod._budget_bucket(int(n_sel * 1.125) + 1, 4096,
                                       1 << 20, m)
    md = min(4 * budget, 1 << 20)
    print(f"  n_sel={n_sel} budget={budget} md={md}")

    @functools.partial(jax.jit, static_argnames=("b",))
    def compact(cut, b):
        mask = cut.render_mask
        neg_size = -jnp.where(jnp.isfinite(cut.size), cut.size, 3.4e38)
        _, _, idx = jax.lax.sort(
            ((~mask).astype(jnp.int32), neg_size,
             jnp.arange(m, dtype=jnp.int32)), num_keys=2)
        return jnp.clip(idx[:b], 0, m - 1)

    idx = timeit("compaction sort", compact, cut, budget)

    @jax.jit
    def interp(cut, idx):
        parent = jnp.clip(nodes[idx, NODE_PARENT], 0, m - 1)
        params = dict(means3d=pos, scales=scale, quats=quat, opacities=op,
                      shs=sh)
        out = cut_mod.interpolate_with_parents(params, idx, parent,
                                               cut.ts[idx])
        out["ts"] = cut.ts[idx]
        out["kids"] = jnp.maximum(cut.kids[idx], 1)
        return out

    iv = timeit("interpolation", interp, cut, idx)

    itab = jax.block_until_ready(cut_mod.build_interp_table(
        dict(means3d=pos, scales=scale, quats=quat, opacities=op, shs=sh),
        nodes))

    @jax.jit
    def interp2(cut, idx):
        out = cut_mod.interpolate_from_table(itab, idx, cut.ts[idx])
        return out

    timeit("interpolation (table)", interp2, cut, idx)

    lane_ok = jnp.arange(budget) < n_sel
    qn = iv["quats"] / jnp.linalg.norm(iv["quats"], axis=-1,
                                       keepdims=True).clip(1e-12)
    cfg_md = dataclasses.replace(cfg, max_dup=md)

    def flat():
        out = render_mod.render_arrays(
            iv["means3d"], iv["scales"], qn, iv["opacities"], iv["shs"],
            lane_ok, cam.world_view, cam.full_proj, cam.campos,
            cam.tan_fovx, cam.tan_fovy, jnp.zeros(3), iv["ts"], iv["kids"],
            sh_degree=0, width=width, height=height, cfg=cfg_md, k_max=512,
            use_lod=True)
        return out.image, out.truncated

    img, tr = timeit("flat render of cut", flat)
    print(f"  truncated={bool(tr)}")

    def full():
        out, n = render_mod.render_lod(
            pos, scale, quat, op, sh, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None, pcache, cut,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=cfg_md, k_max=512, use_frustum=False)
        return out.image

    timeit("render_lod (cut passed)", full)

    def full2(md2):
        import dataclasses as dc
        out, n = render_mod.render_lod(
            pos, scale, quat, op, sh, nodes, alive,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, jnp.zeros(3), target, None, None, pcache, cut,
            itab,
            sh_degree=0, width=width, height=height, budget=budget,
            cfg=dc.replace(cfg, max_dup=md2), k_max=512, use_frustum=False)
        return out.image, out.truncated

    for md2 in (md, md // 2, (md // 2) + (md // 4)):
        img, tr = timeit(f"render_lod (cut+table) md={md2}",
                         lambda m2=md2: full2(m2))
        print(f"  truncated={bool(tr)}")

    # flat-render internals at this scale (budget rows, md=3/4 of 4*budget)
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops.binning import (align_bins, bin_gaussians,
                                                tile_grid)
    md3 = (md // 2) + (md // 4)
    TW = TH = 32
    gw, gh = tile_grid(width, height, TW, TH)
    focal_x = width / (2.0 * float(cam.tan_fovx))
    focal_y = height / (2.0 * float(cam.tan_fovy))

    @jax.jit
    def pre(iv):
        q = iv["quats"] / jnp.linalg.norm(iv["quats"], axis=-1,
                                          keepdims=True).clip(1e-12)
        cov6 = gaussian_math.compute_cov3d(iv["scales"], q)
        proj = gaussian_math.project_gaussians(
            iv["means3d"], cov6, iv["opacities"], cam.world_view,
            cam.full_proj, width, height, focal_x, focal_y,
            float(cam.tan_fovx), float(cam.tan_fovy), valid_in=lane_ok)
        color = sh_ops.sh_color(0, iv["shs"], iv["means3d"], cam.campos)
        return proj, color

    proj, color = timeit("  preprocess+SH", pre, iv)

    @jax.jit
    def binalign(proj):
        bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                             width, height, TW, TH, md3,
                             ext=proj.ext, reff2=proj.reff2)
        return align_bins(bins, gw * gh, 128), bins.num_dup

    (ab, ndup) = timeit("  bin+align", binalign, proj)
    print(f"  num_dup={int(ndup)} cap={ab.entry_gid.shape[0]}")

    @jax.jit
    def egather(proj, color, ab):
        n = proj.xy.shape[0]
        feats = jnp.stack([
            proj.xy[:, 0], proj.xy[:, 1],
            -0.5 * proj.conic[:, 0], -proj.conic[:, 1],
            -0.5 * proj.conic[:, 2], proj.opacity, color[:, 0], color[:, 1],
            color[:, 2], 1.0 / jnp.maximum(proj.depth, 1e-6),
            iv["ts"], iv["kids"].astype(jnp.float32),
            jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
            jnp.zeros((n,))], axis=0)
        return rast._expand(feats, ab)

    entry_data = timeit("  entry gather", egather, proj, color, ab)

    @jax.jit
    def fwd(entry_data, ab):
        cfgt = (gw * gh, gw, TH, TW, width, height, 1e-4, 1.0 / 255.0,
                True, False, False)
        return rast._blend(cfgt, entry_data, ab.tile_starts, ab.tile_counts)

    timeit("  fwd kernel", fwd, entry_data, ab)


if __name__ == "__main__":
    main()
