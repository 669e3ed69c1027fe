"""Rasterizer correctness: brute-force parity, compositing math, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.ops import gaussian_math
from hlod_gaussians_tpu.ops.binning import bin_gaussians, compute_rects
from hlod_gaussians_tpu.ops.rasterize_xla import rasterize_scan, lod_alpha
from hlod_gaussians_tpu import render as render_mod
from hlod_gaussians_tpu.utils import camera as cam_utils

CFG = RasterizerConfig(tile_w=16, tile_h=8, max_dup=1 << 14)


def brute_force(xy, depth, conic, opacity, color, invd, radius, valid, w, h,
                bg, ts=None, kids=None, t_eps=1e-4, alpha_min=1 / 255.0,
                tile_w=16, tile_h=8):
    """Straight NumPy port of the CUDA per-pixel loop (incl. tile rects)."""
    n = len(xy)
    order = np.argsort(depth, kind="stable")
    img = np.zeros((h, w, 4), np.float32)
    final_t = np.ones((h, w), np.float32)
    mnx, mny, rw, rh = (np.asarray(v) for v in compute_rects(
        jnp.asarray(xy), jnp.asarray(radius), w, h, tile_w, tile_h))
    for pyy in range(h):
        for pxx in range(w):
            T = 1.0
            C = np.zeros(4)
            txi, tyi = pxx // tile_w, pyy // tile_h
            for i in order:
                if not valid[i]:
                    continue
                if not (mnx[i] <= txi < mnx[i] + rw[i] and mny[i] <= tyi < mny[i] + rh[i]):
                    continue
                dx, dy = xy[i, 0] - pxx, xy[i, 1] - pyy
                power = -0.5 * (conic[i, 0] * dx * dx + conic[i, 2] * dy * dy) - conic[i, 1] * dx * dy
                if power > 0:
                    continue
                a = min(0.99, opacity[i] * np.exp(power))
                if ts is not None:
                    ka = 1.0 - (1.0 - a) ** (1.0 / kids[i])
                    a = ts[i] * a + (1.0 - ts[i]) * ka
                if a < alpha_min:
                    continue
                test_t = T * (1 - a)
                if test_t < t_eps:
                    break
                C[:3] += color[i] * a * T
                C[3] += invd[i] * a * T
                T = test_t
            img[pyy, pxx, :3] = C[:3] + T * bg
            img[pyy, pxx, 3] = C[3]
            final_t[pyy, pxx] = T
    return img, final_t


def random_scene(n=50, w=48, h=32, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform([-5, -5], [w + 5, h + 5], (n, 2)).astype(np.float32)
    depth = rng.uniform(1, 10, n).astype(np.float32)
    # random SPD conics from random 2x2 covariance
    sig = rng.uniform(1.0, 4.0, (n, 2))
    rho = rng.uniform(-0.7, 0.7, n)
    cxx = sig[:, 0] ** 2
    cyy = sig[:, 1] ** 2
    cxy = rho * sig[:, 0] * sig[:, 1]
    det = cxx * cyy - cxy ** 2
    conic = np.stack([cyy / det, -cxy / det, cxx / det], -1).astype(np.float32)
    radius = np.ceil(3 * np.maximum(sig[:, 0], sig[:, 1])).astype(np.int32)
    opacity = rng.uniform(0.2, 1.0, n).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    invd = (1.0 / depth).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    return xy, depth, conic, opacity, color, invd, radius, valid


def run_tiled(xy, depth, conic, opacity, color, invd, radius, valid, w, h, bg,
              ts=None, kids=None, k_max=256):
    bins = bin_gaussians(jnp.asarray(xy), jnp.asarray(depth), jnp.asarray(radius),
                         jnp.asarray(valid), w, h, CFG.tile_w, CFG.tile_h, CFG.max_dup)
    out = rasterize_scan(
        bins, jnp.asarray(xy), jnp.asarray(conic), jnp.asarray(opacity),
        jnp.asarray(color), jnp.asarray(invd), jnp.asarray(bg),
        None if ts is None else jnp.asarray(ts),
        None if kids is None else jnp.asarray(kids),
        width=w, height=h, tile_w=CFG.tile_w, tile_h=CFG.tile_h, k_max=k_max)
    return out


class TestBinning:
    def test_counts_match_rects(self):
        xy, depth, conic, opacity, color, invd, radius, valid = random_scene()
        w, h = 48, 32
        bins = bin_gaussians(jnp.asarray(xy), jnp.asarray(depth), jnp.asarray(radius),
                             jnp.asarray(valid), w, h, CFG.tile_w, CFG.tile_h, CFG.max_dup)
        mnx, mny, rw, rh = compute_rects(jnp.asarray(xy), jnp.asarray(radius), w, h,
                                         CFG.tile_w, CFG.tile_h)
        expect_total = int((np.asarray(rw) * np.asarray(rh) * valid).sum())
        assert int(bins.num_dup) == expect_total
        assert int(bins.tile_counts.sum()) == expect_total
        assert not bool(bins.overflow)

    def test_depth_sorted_within_tile(self):
        xy, depth, conic, opacity, color, invd, radius, valid = random_scene(seed=3)
        w, h = 48, 32
        bins = bin_gaussians(jnp.asarray(xy), jnp.asarray(depth), jnp.asarray(radius),
                             jnp.asarray(valid), w, h, CFG.tile_w, CFG.tile_h, CFG.max_dup)
        starts = np.asarray(bins.tile_starts)
        counts = np.asarray(bins.tile_counts)
        gids = np.asarray(bins.sorted_gid)
        for t in range(len(starts)):
            d = depth[gids[starts[t]:starts[t] + counts[t]]]
            assert (np.diff(d) >= 0).all()


class TestBlend:
    def test_matches_bruteforce(self):
        xy, depth, conic, opacity, color, invd, radius, valid = random_scene(seed=1)
        w, h = 48, 32
        bg = np.array([0.1, 0.2, 0.3], np.float32)
        out = run_tiled(xy, depth, conic, opacity, color, invd, radius, valid, w, h, bg)
        ref_img, ref_t = brute_force(xy, depth, conic, opacity, color, invd,
                                     radius, valid, w, h, bg)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.image), 0, -1),
                                   ref_img[..., :3], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.invdepth), ref_img[..., 3], atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.final_t), ref_t, atol=2e-5)
        assert not bool(out.truncated)

    def test_matches_bruteforce_lod(self):
        xy, depth, conic, opacity, color, invd, radius, valid = random_scene(seed=2)
        rng = np.random.default_rng(7)
        n = len(xy)
        ts = rng.uniform(0, 1, n).astype(np.float32)
        kids = rng.integers(1, 4, n).astype(np.int32)
        w, h = 48, 32
        bg = np.zeros(3, np.float32)
        out = run_tiled(xy, depth, conic, opacity, color, invd, radius, valid,
                        w, h, bg, ts=ts, kids=kids)
        ref_img, _ = brute_force(xy, depth, conic, opacity, color, invd, radius,
                                 valid, w, h, bg, ts=ts, kids=kids)
        np.testing.assert_allclose(np.moveaxis(np.asarray(out.image), 0, -1),
                                   ref_img[..., :3], atol=2e-5)

    def test_single_gaussian_peak(self):
        w, h = 32, 16
        xy = np.array([[10.0, 7.0]], np.float32)  # exactly a pixel center
        conic = np.array([[0.25, 0.0, 0.25]], np.float32)
        opacity = np.array([0.8], np.float32)
        color = np.array([[1.0, 0.5, 0.0]], np.float32)
        out = run_tiled(xy, np.array([5.0], np.float32), conic, opacity, color,
                        np.array([0.2], np.float32), np.array([12], np.int32),
                        np.array([True]), w, h, np.zeros(3, np.float32))
        img = np.asarray(out.image)
        np.testing.assert_allclose(img[:, 7, 10], 0.8 * color[0], atol=1e-6)
        assert abs(float(out.final_t[7, 10]) - 0.2) < 1e-6

    def test_lod_alpha_formula(self):
        a = jnp.float32(0.6)
        # t=1 -> unchanged; t=0, kids=2 -> 1-sqrt(0.4)
        assert abs(float(lod_alpha(a, 1.0, 0.5)) - 0.6) < 1e-6
        np.testing.assert_allclose(float(lod_alpha(a, 0.0, 0.5)),
                                   1.0 - np.sqrt(0.4), rtol=1e-6)

    def test_seen_flags(self):
        w, h = 32, 16
        xy = np.array([[8.0, 8.0], [1000.0, 1000.0]], np.float32)
        conic = np.tile(np.array([[0.5, 0.0, 0.5]], np.float32), (2, 1))
        out = run_tiled(xy, np.array([1.0, 2.0], np.float32), conic,
                        np.array([0.9, 0.9], np.float32),
                        np.ones((2, 3), np.float32), np.ones(2, np.float32),
                        np.array([6, 6], np.int32), np.array([True, True]),
                        w, h, np.zeros(3, np.float32))
        seen = np.asarray(out.seen)
        assert seen[0] and not seen[1]


class TestEndToEndRender:
    def _scene(self, n=30, seed=5):
        rng = np.random.default_rng(seed)
        means = rng.uniform([-1, -1, 4], [1, 1, 8], (n, 3)).astype(np.float32)
        scales = np.exp(rng.uniform(-3.0, -1.5, (n, 3))).astype(np.float32)
        quats = rng.standard_normal((n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        opac = rng.uniform(0.3, 0.95, n).astype(np.float32)
        shs = rng.uniform(-0.3, 0.3, (n, 1, 3)).astype(np.float32)
        return means, scales, quats, opac, shs

    def test_full_render_runs_and_is_finite(self):
        means, scales, quats, opac, shs = self._scene()
        cam = cam_utils.make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, 64, 40)
        out = render_mod.render_arrays(
            jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), jnp.ones(len(means), bool),
            cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx, cam.tan_fovy,
            jnp.zeros(3), sh_degree=0, width=cam.width, height=cam.height,
            cfg=CFG, k_max=128)
        assert np.isfinite(np.asarray(out.image)).all()
        assert float(out.image.max()) > 0.01  # something rendered

    def test_gradients_match_finite_differences(self):
        # f32 central differences on a sum-of-squares loss are swamped by
        # rounding (delta ~1e-4 of the loss magnitude), so run in x64.
        with jax.enable_x64(True):
            means, scales, quats, opac, shs = self._scene(n=6, seed=8)
            means = means.astype(np.float64)
            opac = opac.astype(np.float64)
            cam = cam_utils.make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, 32, 24)
            wv = cam.world_view.astype(jnp.float64)
            fp = cam.full_proj.astype(jnp.float64)
            target = jnp.zeros((3, cam.height, cam.width), jnp.float64)

            def loss_fn(means3d, opacities):
                out = render_mod.render_arrays(
                    means3d, jnp.asarray(scales, jnp.float64),
                    jnp.asarray(quats, jnp.float64), opacities,
                    jnp.asarray(shs, jnp.float64), jnp.ones(len(means), bool),
                    wv, fp, cam.campos.astype(jnp.float64),
                    jnp.float64(cam.tan_fovx), jnp.float64(cam.tan_fovy),
                    jnp.zeros(3, jnp.float64), sh_degree=0, width=cam.width,
                    height=cam.height, cfg=CFG, k_max=64)
                return jnp.sum((out.image - target) ** 2)

            g_means, g_opac = jax.grad(loss_fn, argnums=(0, 1))(
                jnp.asarray(means), jnp.asarray(opac))
            g_means = np.asarray(g_means)
            g_opac = np.asarray(g_opac)

            eps = 1e-5
            rng = np.random.default_rng(0)
            for _ in range(6):
                i = rng.integers(0, len(means))
                j = rng.integers(0, 3)
                mp, mm = means.copy(), means.copy()
                mp[i, j] += eps
                mm[i, j] -= eps
                fd = (float(loss_fn(jnp.asarray(mp), jnp.asarray(opac)))
                      - float(loss_fn(jnp.asarray(mm), jnp.asarray(opac)))) / (2 * eps)
                np.testing.assert_allclose(g_means[i, j], fd, rtol=1e-3, atol=1e-6)
            for i in range(len(opac)):
                op, om = opac.copy(), opac.copy()
                op[i] += eps
                om[i] -= eps
                fd = (float(loss_fn(jnp.asarray(means), jnp.asarray(op)))
                      - float(loss_fn(jnp.asarray(means), jnp.asarray(om)))) / (2 * eps)
                np.testing.assert_allclose(g_opac[i], fd, rtol=1e-3, atol=1e-6)
