"""End-to-end public-API drive: ring render, background/truncation
probes, 60-step Adam gradient fit. The /verify skill runs this; it must
print VERIFY OK. CPU-only (forces jax_platforms=cpu before backend use)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import hlod_gaussians_tpu  # noqa: F401  (sets matmul precision)
from hlod_gaussians_tpu import render
from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.utils.camera import make_camera

C0 = 0.28209479177387814
N = 24
ang = np.linspace(0, 2 * np.pi, N, endpoint=False)
means = np.stack([1.5 * np.cos(ang), 1.5 * np.sin(ang),
                  np.full(N, 5.0)], axis=1).astype(np.float32)
scales = np.full((N, 3), 0.15, np.float32)
quats = np.tile(np.asarray([1, 0, 0, 0], np.float32), (N, 1))
opac = np.full((N,), 0.95, np.float32)
rgb = np.stack([0.5 + 0.5 * np.cos(ang), 0.5 + 0.5 * np.sin(ang),
                np.linspace(0.1, 0.9, N)], axis=1).astype(np.float32)
shs = ((rgb - 0.5) / C0)[:, None, :]
valid = np.ones((N,), bool)

cam = make_camera(np.eye(3), np.zeros(3), 1.0, 1.0, 128, 128)
cfg = RasterizerConfig(backend="pallas", tile_w=16, tile_h=8, max_dup=1 << 16)
bg = jnp.zeros(3)

args = [jnp.asarray(a) for a in (means, scales, quats, opac, shs, valid)]
out = render.render_arrays(*args, cam.world_view, cam.full_proj, cam.campos,
                           cam.tan_fovx, cam.tan_fovy, bg, sh_degree=0,
                           width=128, height=128, cfg=cfg, k_max=128)
img = np.asarray(out.image)
cov = float((img.sum(0) > 0.05).mean())
print(f"ring coverage: {cov:.3f} truncated={bool(out.truncated)}")
assert 0.2 < cov < 0.5 and not bool(out.truncated)

out_bg = render.render_arrays(args[0], args[1], args[2], args[3], args[4],
                              jnp.zeros((N,), bool), cam.world_view,
                              cam.full_proj, cam.campos, cam.tan_fovx,
                              cam.tan_fovy, jnp.full(3, 0.25), sh_degree=0,
                              width=128, height=128, cfg=cfg, k_max=128)
assert np.allclose(np.asarray(out_bg.image), 0.25), "empty != background"
print("empty scene == background OK")

cfg_x = RasterizerConfig(backend="xla", tile_w=16, tile_h=8, max_dup=1 << 16)
out_t = render.render_arrays(*args, cam.world_view, cam.full_proj, cam.campos,
                             cam.tan_fovx, cam.tan_fovy, bg, sh_degree=0,
                             width=128, height=128, cfg=cfg_x, k_max=1)
assert bool(out_t.truncated), "k_max=1 xla should truncate"
print("xla k_max truncation OK")

# gradient fit: jitter means+shs, 60 adam steps on L1 vs clean render
import optax
target = jnp.asarray(img)
rng = np.random.default_rng(0)
m0 = jnp.asarray(means + rng.normal(0, 0.15, means.shape).astype(np.float32))
s0 = jnp.asarray(shs + rng.normal(0, 0.3, shs.shape).astype(np.float32))

def loss_fn(m, s):
    o = render.render_arrays(m, args[1], args[2], args[3], s, args[5],
                             cam.world_view, cam.full_proj, cam.campos,
                             cam.tan_fovx, cam.tan_fovy, bg, sh_degree=0,
                             width=128, height=128, cfg=cfg, k_max=128)
    return jnp.abs(o.image - target).mean()

opt = optax.adam(2e-2)
params = (m0, s0)
st = opt.init(params)
vg = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
l0 = None
for i in range(60):
    l, g = vg(*params)
    if l0 is None:
        l0 = float(l)
    up, st = opt.update(g, st)
    params = tuple(p + u for p, u in zip(params, up))
l1 = float(vg(*params)[0])
red = 1 - l1 / l0
print(f"gradient fit: L1 {l0:.5f} -> {l1:.5f} ({red:.1%} reduction)")
assert red > 0.5, "gradient fit did not converge"
print("VERIFY OK")
