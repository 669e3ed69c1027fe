"""On-TPU correctness check of the compact (unaligned, boundary-RMW)
rasterizer path vs the XLA scan backend — interpret-mode tests can't catch
Mosaic-specific hazards (uninitialized HBM output buffers, DMA ordering of
the boundary read-modify-write), so this must run on the real chip."""
import os
import sys

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

    def rend(backend, want_seen=False, x=None):
        cfg = RasterizerConfig(backend=backend, tile_w=32, tile_h=32,
                               max_dup=1 << 16, tight_binning=False)
        return render_mod.render_arrays(
            jnp.asarray(xyz) if x is None else x, jnp.asarray(scales),
            jnp.asarray(quats), jnp.asarray(ops), jnp.asarray(shs), valid,
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
            cam.tan_fovy, bg, sh_degree=0, width=W, height=H, cfg=cfg,
            k_max=512, want_seen=want_seen)

    o_p = jax.jit(lambda: rend("pallas", want_seen=True))()
    o_x = jax.jit(lambda: rend("xla", want_seen=True))()
    di = float(jnp.abs(o_p.image - o_x.image).max())
    dt = float(jnp.abs(o_p.final_t - o_x.final_t).max())
    ds = int(jnp.sum(o_p.seen != o_x.seen))
    print(f"image max|d|={di:.2e}  final_t max|d|={dt:.2e} "
          f"seen mismatches={ds}", flush=True)
    # tolerance provenance: the round-3 ALIGNED layout measures the IDENTICAL
    # 1.18e-4 / 2.86e-4 on this scene (scripts/probe_compact_tpu_ab.py) —
    # the spread is TPU-vs-scan-backend compilation numerics, not layout
    assert di < 5e-4 and dt < 1e-3 and ds == 0, (di, dt, ds)

    def loss(backend, x):
        out = rend(backend, x=x)
        w = jnp.sin(jnp.arange(out.image.size).reshape(out.image.shape))
        return (out.image * w).sum()

    g_p = jax.jit(jax.grad(lambda x: loss("pallas", x)))(jnp.asarray(xyz))
    g_x = jax.jit(jax.grad(lambda x: loss("xla", x)))(jnp.asarray(xyz))
    s = float(jnp.abs(g_x).max()) + 1e-12
    dg = float(jnp.abs(g_p - g_x).max()) / s
    print(f"xyz grad rel max|d|={dg:.2e}", flush=True)
    assert dg < 5e-4, dg
    print("COMPACT TPU PARITY OK", flush=True)


if __name__ == "__main__":
    main()
