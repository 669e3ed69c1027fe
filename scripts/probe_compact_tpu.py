"""On-TPU correctness check of the compact (unaligned, boundary-RMW)
rasterizer path vs the XLA scan backend — interpret-mode tests can't catch
Mosaic-specific hazards (uninitialized HBM output buffers, DMA ordering of
the boundary read-modify-write), so this must run on the real chip.

Drives ops.rasterize.rasterize_pallas_full(layout=...) DIRECTLY (the
render.py facade is pinned to the aligned layout, so going through
render_arrays would silently test the wrong path — ADVICE r04).
probe_compact_tpu_ab.py calls main(layout="aligned") for the numerics A/B.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(layout: str = "compact"):
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
    from hlod_gaussians_tpu.ops import gaussian_math
    from hlod_gaussians_tpu.ops import rasterize as rast
    from hlod_gaussians_tpu.ops import sh as sh_ops
    from hlod_gaussians_tpu.utils.camera import make_camera

    W = H = 256
    n = 3000
    rng = np.random.default_rng(5)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 1.1
    xyz[:, 2] = 4.0 + rng.uniform(-1, 1, n)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 2.2).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.2, 0.95, n).astype(np.float32)
    ops[500:900] = 1e-4          # never-applied band (zfill/ofs paths)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32) * 0.4
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, W, H)
    valid = jnp.ones((n,), bool)
    bg = jnp.asarray([0.2, 0.1, 0.3])
    cfg = RasterizerConfig(tile_w=32, tile_h=32, max_dup=1 << 16,
                           tight_binning=False)

    def pallas_full(x, want_seen=False):
        """Projection + SH exactly as render_arrays, then the direct
        rasterize_pallas_full entry with the requested layout."""
        focal_x = W / (2.0 * cam.tan_fovx)
        focal_y = H / (2.0 * cam.tan_fovy)
        sc = jnp.asarray(scales)
        cov6 = gaussian_math.compute_cov3d(sc, jnp.asarray(quats))
        proj = gaussian_math.project_gaussians(
            x, cov6, jnp.asarray(ops), cam.world_view, cam.full_proj,
            W, H, focal_x, focal_y, cam.tan_fovx, cam.tan_fovy,
            dilation=cfg.dilation, antialiasing=False, near=cfg.near,
            valid_in=valid, big_limit=cfg.big_limit,
            max_scale=jnp.max(sc, axis=-1))
        color = sh_ops.sh_color(0, jnp.asarray(shs), x, cam.campos)
        invdepth_g = 1.0 / jnp.maximum(proj.depth, 1e-6)
        return rast.rasterize_pallas_full(
            proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
            proj.opacity, color, invdepth_g, bg,
            width=W, height=H, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
            max_dup=cfg.max_dup, t_eps=cfg.t_eps, alpha_min=cfg.alpha_min,
            want_seen=want_seen, layout=layout)

    def rend_xla(want_seen=False, x=None):
        xcfg = RasterizerConfig(backend="xla", tile_w=32, tile_h=32,
                                max_dup=1 << 16, tight_binning=False)
        return render_mod.render_arrays(
            jnp.asarray(xyz) if x is None else x, jnp.asarray(scales),
            jnp.asarray(quats), jnp.asarray(ops), jnp.asarray(shs), valid,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, bg, sh_degree=0, width=W, height=H, cfg=xcfg,
            k_max=512, want_seen=want_seen)

    o_p = jax.jit(lambda: pallas_full(jnp.asarray(xyz), want_seen=True))()
    o_x = jax.jit(lambda: rend_xla(want_seen=True))()
    di = float(jnp.abs(o_p.image - o_x.image).max())
    dt = float(jnp.abs(o_p.final_t - o_x.final_t).max())
    ds = int(jnp.sum(o_p.seen != o_x.seen))
    print(f"[{layout}] image max|d|={di:.2e}  final_t max|d|={dt:.2e} "
          f"seen mismatches={ds}", flush=True)
    # tolerance provenance: the aligned layout measures the same-order
    # spread on this scene (run probe_compact_tpu_ab.py) — the diff is
    # TPU-vs-scan-backend compilation numerics, not layout
    assert di < 5e-4 and dt < 1e-3 and ds == 0, (di, dt, ds)

    def loss_pallas(x):
        out = pallas_full(x)
        w = jnp.sin(jnp.arange(out.image.size).reshape(out.image.shape))
        return (out.image * w).sum()

    def loss_xla(x):
        out = rend_xla(x=x)
        w = jnp.sin(jnp.arange(out.image.size).reshape(out.image.shape))
        return (out.image * w).sum()

    g_p = jax.jit(jax.grad(loss_pallas))(jnp.asarray(xyz))
    g_x = jax.jit(jax.grad(loss_xla))(jnp.asarray(xyz))
    s = float(jnp.abs(g_x).max()) + 1e-12
    dg = float(jnp.abs(g_p - g_x).max()) / s
    print(f"[{layout}] xyz grad rel max|d|={dg:.2e}", flush=True)
    assert dg < 5e-4, dg
    print(f"{layout.upper()} TPU PARITY OK", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "compact")
