"""Pallas blend kernel parity vs. the XLA scan reference (interpret mode).

The XLA scan (ops/rasterize_xla.py) is the semantic ground truth — itself
validated against the CUDA reference semantics in test_rasterize.py. The
Pallas path must match it on forward images AND input gradients.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
from hlod_gaussians_tpu.ops.binning import bin_gaussians
from hlod_gaussians_tpu.ops.rasterize import rasterize_pallas_full
from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan
from hlod_gaussians_tpu.utils.camera import make_camera

W, H = 64, 48
TILE_W, TILE_H = 16, 8
MAX_DUP = 2048


def make_scene(n=80, seed=0, spread=1.2, z=4.0, big=False):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * spread
    xyz[:, 2] = z + rng.uniform(-1, 1, n)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - (1.5 if big else 2.5)
                    ).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.2, 0.95, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, W, H)
    return xyz, scales, quats, ops, colors, cam


def project(xyz, scales, quats, ops, cam):
    fx = W / (2 * cam.tan_fovx)
    fy = H / (2 * cam.tan_fovy)
    cov6 = gaussian_math.compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    return gaussian_math.project_gaussians(
        jnp.asarray(xyz), cov6, jnp.asarray(ops), cam.world_view,
        cam.full_proj, W, H, fx, fy, cam.tan_fovx, cam.tan_fovy)


def run_both(n=80, seed=0, use_lod=False, big=False, bg_val=0.3):
    xyz, scales, quats, ops, colors, cam = make_scene(n, seed, big=big)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), bg_val)

    if use_lod:
        rng = np.random.default_rng(seed + 1)
        ts = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        kids = jnp.asarray(rng.integers(1, 4, n).astype(np.int32))
    else:
        ts = kids = None

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, ts, kids,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=256)

    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg, ts, kids,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
        interpret=True)
    return out_ref, out_pal, (proj, color, invd, bg, ts, kids)


@pytest.mark.parametrize("use_lod", [False, True])
def test_forward_parity(use_lod):
    out_ref, out_pal, _ = run_both(use_lod=use_lod)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pal.invdepth),
                               np.asarray(out_ref.invdepth), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_pal.final_t),
                               np.asarray(out_ref.final_t), atol=2e-5)


def test_forward_parity_dense_overlap():
    """Heavy overlap exercises the early-stop path."""
    out_ref, out_pal, _ = run_both(n=200, seed=3, big=True)
    assert int(np.asarray(out_ref.n_contrib).max()) > 20
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_pal.final_t),
                               np.asarray(out_ref.final_t), atol=5e-5)


def test_n_contrib_parity():
    out_ref, out_pal, _ = run_both(n=120, seed=5)
    np.testing.assert_array_equal(np.asarray(out_pal.n_contrib),
                                  np.asarray(out_ref.n_contrib))


@pytest.mark.parametrize("use_lod", [False, True])
def test_gradient_parity(use_lod):
    """d(loss)/d(xy, conic, opacity, color) match autodiff-through-scan."""
    xyz, scales, quats, ops, colors, cam = make_scene(60, seed=7)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.asarray([0.2, 0.1, 0.4])
    n = xyz.shape[0]
    if use_lod:
        rng = np.random.default_rng(8)
        ts = jnp.asarray(rng.uniform(0.2, 1, n).astype(np.float32))
        kids = jnp.asarray(rng.integers(1, 4, n).astype(np.int32))
    else:
        ts = kids = None

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    tgt = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (3, H, W))
                      .astype(np.float32))

    def loss_ref(xy, conic, op, col):
        out = rasterize_scan(bins, xy, conic, op, col, invd, bg, ts, kids,
                             width=W, height=H, tile_w=TILE_W, tile_h=TILE_H,
                             k_max=256)
        return jnp.abs(out.image - tgt).mean() + 0.1 * out.invdepth.mean() \
            + 0.05 * out.final_t.mean()

    def loss_pal(xy, conic, op, col):
        out = rasterize_pallas_full(
            xy, proj.depth, proj.radius, proj.valid, conic, op, col, invd,
            bg, ts, kids, width=W, height=H, tile_w=TILE_W, tile_h=TILE_H,
            max_dup=MAX_DUP, interpret=True)
        return jnp.abs(out.image - tgt).mean() + 0.1 * out.invdepth.mean() \
            + 0.05 * out.final_t.mean()

    args = (proj.xy, proj.conic, proj.opacity, color)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(*args)

    for name, gr, gp in zip(("xy", "conic", "op", "color"), g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gp / scale, gr / scale, atol=3e-4,
                                   err_msg=name)


def test_invdepth_gradient_not_dropped():
    """The 4th blend channel must carry gradients too."""
    xyz, scales, quats, ops, colors, cam = make_scene(40, seed=11)
    proj = project(xyz, scales, quats, ops, cam)

    def loss(invd):
        out = rasterize_pallas_full(
            proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
            proj.opacity, jnp.asarray(colors), invd, jnp.zeros(3),
            width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
            interpret=True)
        return out.invdepth.sum()

    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    g = np.asarray(jax.grad(loss)(invd))
    assert np.abs(g).max() > 0


def test_tight_binning_image_parity():
    """Alpha-aware tight coverage must not change the image: every dropped
    entry fails the kernel's own alpha >= alpha_min skip."""
    xyz, scales, quats, ops, colors, cam = make_scene(150, seed=13, big=True)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), 0.25)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, None, None,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=256)

    out_tight = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
        ext=proj.ext, reff2=proj.reff2, interpret=True)

    bins_t = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                           W, H, TILE_W, TILE_H, MAX_DUP,
                           ext=proj.ext, reff2=proj.reff2)
    assert int(bins_t.num_dup) < int(bins.num_dup)  # actually tighter
    np.testing.assert_allclose(np.asarray(out_tight.image),
                               np.asarray(out_ref.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_tight.final_t),
                               np.asarray(out_ref.final_t), atol=5e-5)


def test_seen_parity_vs_scan():
    """Exact per-Gaussian seen flags from the Pallas kernel match the scan
    path (the CUDA forward's seen buffer, forward.cu:568)."""
    out_ref, _, (proj, color, invd, bg, ts, kids) = run_both(n=120, seed=21)
    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
        want_seen=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_pal.seen),
                                  np.asarray(out_ref.seen))
    assert np.asarray(out_pal.seen).any()


def test_gradient_parity_saturated():
    """Dense overlapping scene: early stop saturates tiles, so the backward
    n_contrib bound skips and zero-fills tail chunks — gradients must still
    match autodiff through the scan."""
    xyz, scales, quats, ops, colors, cam = make_scene(200, seed=3, big=True)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.asarray([0.3, 0.2, 0.1])

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    tgt = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (3, H, W))
                      .astype(np.float32))

    def loss_ref(xy, op, col):
        out = rasterize_scan(bins, xy, proj.conic, op, col, invd, bg,
                             None, None, width=W, height=H, tile_w=TILE_W,
                             tile_h=TILE_H, k_max=512)
        return jnp.abs(out.image - tgt).mean()

    def loss_pal(xy, op, col):
        out = rasterize_pallas_full(
            xy, proj.depth, proj.radius, proj.valid, proj.conic, op, col,
            invd, bg, width=W, height=H, tile_w=TILE_W, tile_h=TILE_H,
            max_dup=MAX_DUP, interpret=True)
        return jnp.abs(out.image - tgt).mean()

    args = (proj.xy, proj.opacity, color)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(*args)
    for name, gr, gp in zip(("xy", "op", "color"), g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gp / scale, gr / scale, atol=5e-4,
                                   err_msg=name)


def test_pix256_tile_parity():
    """256-pixel (16x16) tiles: same image as the scan reference."""
    xyz, scales, quats, ops, colors, cam = make_scene(100, seed=17)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), 0.1)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, 16, 16, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, None, None,
        width=W, height=H, tile_w=16, tile_h=16, k_max=256)
    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=16, tile_h=16, max_dup=MAX_DUP,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)

    def loss_pal(op):
        out = rasterize_pallas_full(
            proj.xy, proj.depth, proj.radius, proj.valid, proj.conic, op,
            color, invd, bg, width=W, height=H, tile_w=16, tile_h=16,
            max_dup=MAX_DUP, interpret=True)
        return out.image.sum()

    def loss_ref(op):
        out = rasterize_scan(
            bins, proj.xy, proj.conic, op, color, invd, bg, None, None,
            width=W, height=H, tile_w=16, tile_h=16, k_max=256)
        return out.image.sum()

    g_pal = np.asarray(jax.grad(loss_pal)(proj.opacity))
    g_ref = np.asarray(jax.grad(loss_ref)(proj.opacity))
    scale = np.abs(g_ref).max() + 1e-12
    np.testing.assert_allclose(g_pal / scale, g_ref / scale, atol=3e-4)


def test_tile_32x32_parity():
    """The PRODUCTION bench/LOD tile shape (32x32, 1024 px/tile, tpb=4
    batching) vs the scan reference: image + opacity/xy gradients.

    W=64, H=48 gives a 2x2 grid with ragged right/bottom tiles, exercising
    the inside-mask and the tpb tile-padding path in one go."""
    xyz, scales, quats, ops, colors, cam = make_scene(n=96, seed=5)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), 0.25)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, 32, 32, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, None, None,
        width=W, height=H, tile_w=32, tile_h=32, k_max=256)
    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=32, tile_h=32, max_dup=MAX_DUP,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)

    def loss_pal(op, xy):
        out = rasterize_pallas_full(
            xy, proj.depth, proj.radius, proj.valid, proj.conic, op,
            color, invd, bg, width=W, height=H, tile_w=32, tile_h=32,
            max_dup=MAX_DUP, interpret=True)
        return (out.image * jnp.cos(jnp.arange(out.image.size)
                                    .reshape(out.image.shape))).sum()

    def loss_ref(op, xy):
        b = bin_gaussians(xy, proj.depth, proj.radius, proj.valid,
                          W, H, 32, 32, MAX_DUP)
        out = rasterize_scan(
            b, xy, proj.conic, op, color, invd, bg, None, None,
            width=W, height=H, tile_w=32, tile_h=32, k_max=256)
        return (out.image * jnp.cos(jnp.arange(out.image.size)
                                    .reshape(out.image.shape))).sum()

    gp_op, gp_xy = jax.grad(loss_pal, argnums=(0, 1))(proj.opacity, proj.xy)
    gr_op, gr_xy = jax.grad(loss_ref, argnums=(0, 1))(proj.opacity, proj.xy)
    for gp, gr in ((gp_op, gr_op), (gp_xy, gr_xy)):
        s = np.abs(np.asarray(gr)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(gp) / s, np.asarray(gr) / s,
                                   atol=3e-4)


def test_early_stop_sticky_across_chunks():
    """The t_eps early-stop is STICKY across 128-entry chunk boundaries.

    ~300 gaussians stack on the same pixels, saturating transmittance
    mid-list; the entries AFTER the crossing (2nd/3rd chunk) must never
    re-apply (forward.cu:561-566's sticky `done`). The scan reference
    implements the serial semantics; image + final_t + n_contrib and
    opacity gradients must match."""
    n = 300
    rng = np.random.default_rng(7)
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 0] = rng.uniform(-0.02, 0.02, n)
    xyz[:, 1] = rng.uniform(-0.02, 0.02, n)
    xyz[:, 2] = np.linspace(3.0, 5.0, n)          # distinct depths
    scales = np.full((n, 3), 0.08, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    # alpha ~0.07 per entry: T crosses 1e-4 after ~125 entries — right at
    # the first chunk boundary — with ~175 small-alpha entries behind it
    ops = np.full((n,), 0.07, np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, W, H)
    proj = project(xyz, scales, quats, ops, cam)
    assert int(jnp.sum(proj.valid)) == n
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), 0.2)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, None,
        None, width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=512)
    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
        interpret=True)
    # the scene must actually exercise a crossing beyond chunk 0
    assert int(jnp.max(out_ref.n_contrib)) > 100
    np.testing.assert_array_equal(np.asarray(out_pal.n_contrib),
                                  np.asarray(out_ref.n_contrib))
    np.testing.assert_allclose(np.asarray(out_pal.final_t),
                               np.asarray(out_ref.final_t), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)

    def loss_pal(op):
        out = rasterize_pallas_full(
            proj.xy, proj.depth, proj.radius, proj.valid, proj.conic, op,
            color, invd, bg, width=W, height=H, tile_w=TILE_W,
            tile_h=TILE_H, max_dup=MAX_DUP, interpret=True)
        return out.image.sum()

    def loss_ref(op):
        out = rasterize_scan(
            bins, proj.xy, proj.conic, op, color, invd, bg, None, None,
            width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=512)
        return out.image.sum()

    g_pal = np.asarray(jax.grad(loss_pal)(proj.opacity))
    g_ref = np.asarray(jax.grad(loss_ref)(proj.opacity))
    s = np.abs(g_ref).max() + 1e-12
    np.testing.assert_allclose(g_pal / s, g_ref / s, atol=3e-4)


@pytest.mark.parametrize("linear,interleave", [(False, False),
                                               (True, False),
                                               (False, True)])
def test_nondefault_kernel_flag_combos(linear, interleave):
    """The retained A/B paths (log-space formulation, sequential walk)
    must stay parity-correct even though production defaults to
    linear+interleaved — these are the fallback/measurement paths cited
    in docs/KERNEL_DESIGN.md. Note interleave=True requires linear
    (blend_forward falls back internally when linear=False)."""
    from hlod_gaussians_tpu.ops import rasterize_pallas as rp
    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned

    xyz, scales, quats, ops, colors, cam = make_scene(100, seed=23, big=True)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd,
        jnp.full((3,), 0.2), None, None,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=256)

    abins = bin_gaussians_aligned(proj.xy, proj.depth, proj.radius,
                                  proj.valid, W, H, TILE_W, TILE_H,
                                  MAX_DUP, rp.CHUNK)
    n = proj.xy.shape[0]
    feats = jnp.stack([
        proj.xy[:, 0], proj.xy[:, 1],
        -0.5 * proj.conic[:, 0], -proj.conic[:, 1], -0.5 * proj.conic[:, 2],
        proj.opacity, color[:, 0], color[:, 1], color[:, 2], invd,
        jnp.ones((n,)), jnp.ones((n,)),
        jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)), jnp.zeros((n,)),
    ], axis=0)
    from hlod_gaussians_tpu.ops.rasterize import _expand
    entry_data = _expand(feats, abins)
    from hlod_gaussians_tpu.ops.binning import tile_grid
    gw, gh = tile_grid(W, H, TILE_W, TILE_H)

    img4, final_t, n_contrib, _ = rp.blend_forward(
        entry_data, abins.tile_starts, abins.tile_counts,
        num_tiles=gw * gh, gw=gw, tile_h=TILE_H, tile_w=TILE_W,
        width=W, height=H, linear=linear, interleave=interleave,
        interpret=True)

    def untile(x):
        x = x.reshape(gh, gw, TILE_H, TILE_W)
        return np.swapaxes(x, 1, 2).reshape(gh * TILE_H, gw * TILE_W)[:H, :W]

    ref_ft = np.asarray(out_ref.final_t)
    np.testing.assert_allclose(untile(np.asarray(final_t[:, 0])), ref_ft,
                               atol=5e-5)
    for ch in range(3):
        np.testing.assert_allclose(
            untile(np.asarray(img4[:, ch])),
            np.asarray(out_ref.image[ch]) - 0.2 * ref_ft, atol=5e-5)

    # backward: per-entry gradients must match the default path's
    g4 = jnp.ones_like(img4)
    gft = jnp.zeros_like(final_t)
    eg_var = rp.blend_backward(
        entry_data, abins.tile_starts, abins.tile_counts, final_t,
        n_contrib, g4, gft, num_tiles=gw * gh, gw=gw, tile_h=TILE_H,
        tile_w=TILE_W, width=W, height=H, linear=linear,
        interleave=interleave, interpret=True)
    eg_def = rp.blend_backward(
        entry_data, abins.tile_starts, abins.tile_counts, final_t,
        n_contrib, g4, gft, num_tiles=gw * gh, gw=gw, tile_h=TILE_H,
        tile_w=TILE_W, width=W, height=H, interpret=True)
    s = np.abs(np.asarray(eg_def)).max() + 1e-12
    np.testing.assert_allclose(np.asarray(eg_var) / s,
                               np.asarray(eg_def) / s, atol=5e-5)


def test_compact_unaligned_boundary_paths():
    """Round-4 compact (unaligned) layout: tiles share boundary chunks.

    Exercises the paths the generic parity tests may miss: (a) a tile whose
    entries NEVER apply (alpha < alpha_min => max n_contrib == 0) sitting
    between active tiles — its zero-fill must skip the shared chunk 0
    (ofs > 0) instead of clobbering the predecessor's gradients; (b) seen
    flags merged across a shared chunk via RMW-max."""
    n = 180
    rng = np.random.default_rng(31)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 1.2
    xyz[:, 2] = 4.0 + rng.uniform(-1, 1, n)
    scales = np.exp(rng.normal(size=(n, 3)) * 0.4 - 1.6).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.3, 0.95, n).astype(np.float32)
    # a band of near-invisible gaussians: their entries bin but never apply
    ops[60:120] = 1e-4
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.7, W, H)
    proj = project(xyz, scales, quats, ops, cam)
    color = jnp.asarray(colors)
    invd = 1.0 / jnp.maximum(proj.depth, 1e-6)
    bg = jnp.full((3,), 0.15)

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP)
    # the scene must actually produce unaligned tile starts
    starts = np.asarray(bins.tile_starts)
    counts = np.asarray(bins.tile_counts)
    assert ((starts % 128 != 0) & (counts > 0)).any()

    out_ref = rasterize_scan(
        bins, proj.xy, proj.conic, proj.opacity, color, invd, bg, None,
        None, width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=256)
    out_pal = rasterize_pallas_full(
        proj.xy, proj.depth, proj.radius, proj.valid, proj.conic,
        proj.opacity, color, invd, bg,
        width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, max_dup=MAX_DUP,
        want_seen=True, layout="compact", interpret=True)
    np.testing.assert_allclose(np.asarray(out_pal.image),
                               np.asarray(out_ref.image), atol=2e-5)
    np.testing.assert_array_equal(np.asarray(out_pal.seen),
                                  np.asarray(out_ref.seen))
    assert not np.asarray(out_pal.seen)[60:120].any()

    def loss_pal(op, col):
        out = rasterize_pallas_full(
            proj.xy, proj.depth, proj.radius, proj.valid, proj.conic, op,
            col, invd, bg, width=W, height=H, tile_w=TILE_W, tile_h=TILE_H,
            max_dup=MAX_DUP, layout="compact", interpret=True)
        return (out.image * jnp.sin(jnp.arange(out.image.size)
                                    .reshape(out.image.shape))).sum()

    def loss_ref(op, col):
        out = rasterize_scan(
            bins, proj.xy, proj.conic, op, col, invd, bg, None, None,
            width=W, height=H, tile_w=TILE_W, tile_h=TILE_H, k_max=256)
        return (out.image * jnp.sin(jnp.arange(out.image.size)
                                    .reshape(out.image.shape))).sum()

    g_pal = jax.grad(loss_pal, argnums=(0, 1))(proj.opacity, color)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(proj.opacity, color)
    for name, gp, gr in zip(("op", "color"), g_pal, g_ref):
        gp, gr = np.asarray(gp), np.asarray(gr)
        s = np.abs(gr).max() + 1e-12
        np.testing.assert_allclose(gp / s, gr / s, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("tight", [False, True])
def test_bin_aligned_equals_align_bins(tight):
    """Fused sort-based alignment == bin_gaussians + align_bins (round-3
    directive #2): same tile ranges, same per-tile entry lists, same
    generation->slot map for valid generation entries."""
    from hlod_gaussians_tpu.ops.binning import (align_bins,
                                                bin_gaussians_aligned,
                                                tile_grid)

    xyz, scales, quats, ops, colors, cam = make_scene(n=150, seed=9, big=True)
    proj = project(xyz, scales, quats, ops, cam)
    gw, gh = tile_grid(W, H, TILE_W, TILE_H)
    num_tiles = gw * gh
    kw = dict(ext=proj.ext, reff2=proj.reff2) if tight else {}

    bins = bin_gaussians(proj.xy, proj.depth, proj.radius, proj.valid,
                         W, H, TILE_W, TILE_H, MAX_DUP, **kw)
    ab_ref = align_bins(bins, num_tiles, 128)
    ab_new = bin_gaussians_aligned(proj.xy, proj.depth, proj.radius,
                                   proj.valid, W, H, TILE_W, TILE_H,
                                   MAX_DUP, 128, **kw)

    assert ab_new.entry_gid.shape == ab_ref.entry_gid.shape
    np.testing.assert_array_equal(np.asarray(ab_new.tile_starts),
                                  np.asarray(ab_ref.tile_starts))
    np.testing.assert_array_equal(np.asarray(ab_new.tile_counts),
                                  np.asarray(ab_ref.tile_counts))
    starts = np.asarray(ab_ref.tile_starts)
    counts = np.asarray(ab_ref.tile_counts)
    gid_ref = np.asarray(ab_ref.entry_gid)
    gid_new = np.asarray(ab_new.entry_gid)
    assert counts.sum() > 0
    for t in range(num_tiles):
        s, c = starts[t], counts[t]
        np.testing.assert_array_equal(gid_new[s:s + c], gid_ref[s:s + c])
    valid = np.asarray(ab_ref.gen_valid)
    assert valid.any()
    np.testing.assert_array_equal(
        np.asarray(ab_new.gen_to_slot)[valid],
        np.asarray(ab_ref.gen_to_slot)[valid])
    np.testing.assert_array_equal(np.asarray(ab_new.gen_valid), valid)
    np.testing.assert_array_equal(np.asarray(ab_new.gen_offsets),
                                  np.asarray(ab_ref.gen_offsets))
    np.testing.assert_array_equal(np.asarray(ab_new.gen_counts),
                                  np.asarray(ab_ref.gen_counts))
    np.testing.assert_array_equal(np.asarray(ab_new.order),
                                  np.asarray(ab_ref.order))
    assert bool(ab_new.overflow) == bool(ab_ref.overflow)
    assert int(ab_new.num_candidates) == int(ab_ref.num_candidates)


def test_bin_aligned_overflow_flag():
    from hlod_gaussians_tpu.ops.binning import bin_gaussians_aligned

    xyz, scales, quats, ops, colors, cam = make_scene(n=300, seed=2, big=True)
    proj = project(xyz, scales, quats, ops, cam)
    ab = bin_gaussians_aligned(proj.xy, proj.depth, proj.radius, proj.valid,
                               W, H, TILE_W, TILE_H, 64, 128)
    assert bool(ab.overflow)
