"""TILEPAR_r05: single-chip measurement of the tile-parallel band split at
bench shapes (VERDICT r04 #2 — prove or retire "the road is chips").

The multi-chip claim: N chips each run the full projection + a band-local
bin/blend of 1/N of the pixel rows, plus one gradient psum. This probe runs
each band's step SEQUENTIALLY on the one real chip (mirroring
parallel/tile_parallel.py's per-device program: replicated projection/SH,
tight band membership, band-local aligned binning, Pallas blend fwd+bwd,
band loss) and measures

  * per-band wall time           -> multi-chip wall = max over bands (+psum)
  * per-band dup-entry counts    -> binning duplication/halo inflation
  * total-work inflation         = sum(band times) / full-frame time
  * gradient psum payload        -> ICI time estimated from v5e link rate

Writes TILEPAR_r05.json. Every timing is median of 3 in-process repeats of
a 10-iter block; the cross-session +-20% drift (BASELINE.md) applies to the
absolute rates but cancels in the inflation ratios (same session,
interleaved)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from bench_scene import make_bench_scene
    from hlod_gaussians_tpu.config import RasterizerConfig
    from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned
    from hlod_gaussians_tpu.ops.rasterize import rasterize_tiles
    from hlod_gaussians_tpu.utils.camera import make_camera

    width, full_height = 1920, 1152   # 36 tile rows: divisible by 1/2/4
    sh_degree = 3
    p = make_bench_scene()
    n = p["xyz"].shape[0]
    cam = make_camera(np.eye(3), np.zeros(3), fovx=1.2, fovy=0.85,
                      width=width, height=full_height)
    cfg = RasterizerConfig(backend="pallas", tile_w=32, tile_h=32,
                           max_dup=352 * 1024, tight_binning=True)
    valid = jnp.ones((n,), bool)
    args = tuple(jnp.asarray(p[k]) for k in
                 ("xyz", "log_scale", "quat", "opacity_logit", "f_dc",
                  "f_rest"))

    def band_render(xyz, log_scale, quat, op_logit, f_dc, f_rest,
                    band_idx, *, band_h, max_dup, want_count=False):
        """One tile-mesh device's frame work (parallel/tile_parallel.py
        _render, band-local): full projection + SH, tight band mask,
        band-local aligned binning, Pallas blend."""
        q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
        shs = jnp.concatenate([f_dc, f_rest], axis=1)
        scales = jnp.exp(log_scale)
        opacities = jax.nn.sigmoid(op_logit[..., 0])
        focal_x = width / (2.0 * cam.tan_fovx)
        focal_y = full_height / (2.0 * cam.tan_fovy)
        cov6 = gaussian_math.compute_cov3d(scales, q)
        proj = gaussian_math.project_gaussians(
            xyz, cov6, opacities, cam.world_view, cam.full_proj,
            width, full_height, focal_x, focal_y, cam.tan_fovx,
            cam.tan_fovy, dilation=cfg.dilation, near=cfg.near,
            valid_in=valid, big_limit=cfg.big_limit,
            max_scale=jnp.max(scales, axis=-1))
        color = sh_ops.sh_color(sh_degree, shs, xyz, cam.campos)
        xy_local = proj.xy - jnp.stack(
            [jnp.zeros(()), (band_h * band_idx).astype(jnp.float32)])
        r_y = proj.ext[:, 1]
        in_band = ((xy_local[:, 1] + r_y) >= 0) \
            & ((xy_local[:, 1] - r_y) < band_h)
        valid_b = proj.valid & in_band
        abins = bin_gaussians_aligned(
            jax.lax.stop_gradient(xy_local),
            jax.lax.stop_gradient(proj.depth), proj.radius, valid_b,
            width, band_h, cfg.tile_w, cfg.tile_h, max_dup, rp.CHUNK,
            ext=jax.lax.stop_gradient(proj.ext),
            reff2=jax.lax.stop_gradient(proj.reff2))
        if want_count:
            return abins.tile_starts[-1] + abins.tile_counts[-1], \
                abins.overflow
        out = rasterize_tiles(
            abins, xy_local, proj.conic, proj.opacity, color,
            1.0 / jnp.maximum(proj.depth, 1e-6), jnp.zeros(3),
            width=width, height=band_h, tile_w=cfg.tile_w,
            tile_h=cfg.tile_h, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min,
            tpb=cfg.tpb)
        return out

    def timeit(fn, *a, iters=10, reps=3):
        fn(*a)
        jax.block_until_ready(fn(*a))
        best = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn(*a)
            jax.block_until_ready(o)
            best.append((time.perf_counter() - t0) / iters)
        return float(np.median(best)) * 1e3

    results = {"width": width, "height": full_height, "n_gaussians": int(n),
               "tile": [cfg.tile_w, cfg.tile_h], "bands": {}}

    # gradient psum payload (what N chips all-reduce per step)
    payload = sum(np.prod(a.shape) for a in args) * 4
    results["psum_payload_mb"] = round(payload / 1e6, 2)
    # v5e: 1 ICI link pair per neighbor at ~45 GB/s each way; ring
    # all-reduce moves 2*(N-1)/N * payload per chip
    ici_gbps = 45.0
    results["ici_gbps_assumed"] = ici_gbps

    for n_bands in (1, 2, 3, 4, 6):
        band_h = full_height // n_bands
        # size band capacity to the measured worst band (+pad), like a
        # deployment would
        count_fn = jax.jit(
            lambda *a: band_render(*a, band_h=band_h,
                                   max_dup=cfg.max_dup, want_count=True),
            static_argnames=())
        counts = []
        for b in range(n_bands):
            cnt, ovf = count_fn(*args, jnp.asarray(b, jnp.int32))
            assert not bool(ovf)
            counts.append(int(cnt))
        cap = max(counts)
        cap = ((int(cap * 1.1) + rp.CHUNK - 1) // rp.CHUNK) * rp.CHUNK

        gt = jnp.zeros((3, band_h, width), jnp.float32)

        def loss_fn(xyz, log_scale, quat, op_logit, f_dc, f_rest, bidx):
            out = band_render(xyz, log_scale, quat, op_logit, f_dc,
                              f_rest, bidx, band_h=band_h, max_dup=cap)
            # mean over the FULL frame so per-band grads psum to the
            # full-frame gradient
            return jnp.abs(out.image - gt).sum() / (3 * full_height * width)

        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5)))

        band_ms = []
        for b in range(n_bands):
            ms = timeit(step, *args, jnp.asarray(b, jnp.int32))
            band_ms.append(round(ms, 2))
        results["bands"][str(n_bands)] = {
            "band_h": band_h,
            "dup_counts": counts,
            "band_capacity": cap,
            "band_ms": band_ms,
            "sum_ms": round(sum(band_ms), 2),
            "max_ms": round(max(band_ms), 2),
        }
        print(f"N={n_bands}: dup={counts} cap={cap} ms={band_ms}",
              flush=True)

    full = results["bands"]["1"]
    full_ms = full["band_ms"][0]
    full_dup = full["dup_counts"][0]
    for n_bands in (2, 3, 4, 6):
        r = results["bands"][str(n_bands)]
        r["dup_inflation"] = round(sum(r["dup_counts"]) / full_dup, 3)
        r["work_inflation"] = round(r["sum_ms"] / full_ms, 3)
        psum_ms = 2 * (n_bands - 1) / n_bands * payload / (ici_gbps * 1e9) \
            * 1e3
        r["psum_ms_est"] = round(psum_ms, 2)
        wall = r["max_ms"] + psum_ms
        r["projected_wall_ms"] = round(wall, 2)
        r["projected_mpix_s"] = round(width * full_height / wall / 1e3, 1)
        r["speedup_vs_full"] = round(full_ms / wall, 2)
    results["full_ms"] = full_ms
    results["full_mpix_s"] = round(width * full_height / full_ms / 1e3, 1)
    results["note"] = (
        "bands timed sequentially on ONE chip, same session; projected "
        "multi-chip wall = max band step + ring-psum estimate; absolute "
        "rates carry the +-20% session drift, ratios are interleaved")

    out_path = os.path.join(repo, "TILEPAR_r05.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k != "bands"}))
    for nb in (2, 3, 4, 6):
        r = results["bands"][str(nb)]
        print(f"N={nb}: work_inflation={r['work_inflation']} "
              f"dup_inflation={r['dup_inflation']} "
              f"projected={r['projected_mpix_s']} Mpix/s "
              f"(speedup {r['speedup_vs_full']}x)", flush=True)


if __name__ == "__main__":
    main()
