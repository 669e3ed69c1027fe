"""Projection-chain oracle: independent NumPy transcription of the CUDA
preprocess (forward.cu:141-445) from RAW 3D inputs — scale/quat ->
computeCov3D -> computeCov2D (+dilation, conic, radius, rect) -> ndc2Pix,
plus computeColorFromSH — checked against ops/gaussian_math +
ops/sh.sh_color + binning.compute_rects. The blend oracle in
test_rasterize.py starts at 2D conics; this locks the 3D->2D chain too
(round-3 directive #10).

glm matrices are COLUMN-major: glm::mat3(a..i) fills columns, and the flat
view/proj arrays are consumed as m[0],m[4],m[8],m[12] for the x output
(transformPoint4x3, auxiliary.h) — the transcription uses flat indices
exactly like the CUDA to keep conventions honest.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hlod_gaussians_tpu.ops import gaussian_math, sh as sh_ops
from hlod_gaussians_tpu.ops.binning import compute_rects
from hlod_gaussians_tpu.utils.camera import make_camera

W_IMG, H_IMG = 96, 64
TILE = 16


def glm_mat3(a, b, c, d, e, f, g, h, i):
    """glm::mat3(a..i): entries fill COLUMNS."""
    return np.array([[a, d, g], [b, e, h], [c, f, i]], np.float64)


def oracle_cov3d(scale, mod, rot):
    """computeCov3D (forward.cu:181-215), verbatim incl. glm conventions."""
    S = glm_mat3(mod * scale[0], 0, 0, 0, mod * scale[1], 0,
                 0, 0, mod * scale[2])
    r, x, y, z = rot
    R = glm_mat3(
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y))
    M = S @ R
    Sigma = M.T @ M
    # glm Sigma[i][j] = np Sigma[j, i]; symmetric, upper-right storage
    return np.array([Sigma[0, 0], Sigma[1, 0], Sigma[2, 0],
                     Sigma[1, 1], Sigma[2, 1], Sigma[2, 2]])


def t4x3(p, m):
    """transformPoint4x3 with the flat matrix layout (auxiliary.h)."""
    return np.array([
        m[0] * p[0] + m[4] * p[1] + m[8] * p[2] + m[12],
        m[1] * p[0] + m[5] * p[1] + m[9] * p[2] + m[13],
        m[2] * p[0] + m[6] * p[1] + m[10] * p[2] + m[14]])


def t4x4(p, m):
    return np.array([
        m[0] * p[0] + m[4] * p[1] + m[8] * p[2] + m[12],
        m[1] * p[0] + m[5] * p[1] + m[9] * p[2] + m[13],
        m[2] * p[0] + m[6] * p[1] + m[10] * p[2] + m[14],
        m[3] * p[0] + m[7] * p[1] + m[11] * p[2] + m[15]])


def oracle_cov2d(mean, fx, fy, tan_fovx, tan_fovy, cov3d, vm):
    """computeCov2D (forward.cu:141-176), verbatim."""
    t = t4x3(mean, vm)
    limx, limy = 1.3 * tan_fovx, 1.3 * tan_fovy
    txtz, tytz = t[0] / t[2], t[1] / t[2]
    t[0] = min(limx, max(-limx, txtz)) * t[2]
    t[1] = min(limy, max(-limy, tytz)) * t[2]
    J = glm_mat3(fx / t[2], 0, -(fx * t[0]) / (t[2] * t[2]),
                 0, fy / t[2], -(fy * t[1]) / (t[2] * t[2]),
                 0, 0, 0)
    W = glm_mat3(vm[0], vm[4], vm[8], vm[1], vm[5], vm[9],
                 vm[2], vm[6], vm[10])
    T = W @ J
    Vrk = np.array([[cov3d[0], cov3d[1], cov3d[2]],
                    [cov3d[1], cov3d[3], cov3d[4]],
                    [cov3d[2], cov3d[4], cov3d[5]]])
    cov = T.T @ Vrk.T @ T
    # glm cov[0][0], cov[0][1], cov[1][1] = np [0,0], [1,0], [1,1]
    return np.array([cov[0, 0], cov[1, 0], cov[1, 1]])


_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def oracle_sh_color(deg, sh, pos, campos):
    """computeColorFromSH (forward.cu:36-106 non-interp path)."""
    d = pos - campos
    d = d / np.linalg.norm(d)
    x, y, z = d
    res = _C0 * sh[0]
    if deg > 0:
        res = res - _C1 * y * sh[1] + _C1 * z * sh[2] - _C1 * x * sh[3]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (res + _C2[0] * xy * sh[4] + _C2[1] * yz * sh[5]
                   + _C2[2] * (2 * zz - xx - yy) * sh[6]
                   + _C2[3] * xz * sh[7] + _C2[4] * (xx - yy) * sh[8])
            if deg > 2:
                res = (res + _C3[0] * y * (3 * xx - yy) * sh[9]
                       + _C3[1] * xy * z * sh[10]
                       + _C3[2] * y * (4 * zz - xx - yy) * sh[11]
                       + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * sh[12]
                       + _C3[4] * x * (4 * zz - xx - yy) * sh[13]
                       + _C3[5] * z * (xx - yy) * sh[14]
                       + _C3[6] * x * (xx - 3 * yy) * sh[15])
    return np.maximum(res + 0.5, 0.0)


def oracle_preprocess(pts, scales, quats, ops, cam, fx, fy,
                      dilation=0.3, antialiasing=False):
    """preprocessCUDA (forward.cu:300-445): per-Gaussian valid/conic/
    radius/xy/depth/opacity from 3D inputs."""
    vm = np.asarray(cam.world_view, np.float64).reshape(-1)
    pm = np.asarray(cam.full_proj, np.float64).reshape(-1)
    n = len(pts)
    out = dict(valid=np.zeros(n, bool), conic=np.zeros((n, 3)),
               radius=np.zeros(n), xy=np.zeros((n, 2)), depth=np.zeros(n),
               opacity=np.array(ops, np.float64))
    for i in range(n):
        p_hom = t4x4(pts[i], pm)
        p_w = 1.0 / (p_hom[3] + 1e-7)
        p_proj = p_hom[:3] * p_w
        p_view = t4x3(pts[i], vm)
        if p_view[2] <= 0.2:
            continue
        cov3d = oracle_cov3d(scales[i], 1.0, quats[i])
        cov = oracle_cov2d(pts[i], fx, fy, float(cam.tan_fovx),
                           float(cam.tan_fovy), cov3d, vm)
        det_cov = cov[0] * cov[2] - cov[1] ** 2
        cov[0] += dilation
        cov[2] += dilation
        det = cov[0] * cov[2] - cov[1] ** 2
        if det == 0:
            continue
        det_inv = 1.0 / det
        conic = np.array([cov[2] * det_inv, -cov[1] * det_inv,
                          cov[0] * det_inv])
        mid = 0.5 * (cov[0] + cov[2])
        lam1 = mid + np.sqrt(max(0.1, mid * mid - det))
        radius = np.ceil(3.0 * np.sqrt(lam1))
        px = ((p_proj[0] + 1) * W_IMG - 1) * 0.5
        py = ((p_proj[1] + 1) * H_IMG - 1) * 0.5
        if radius <= 0:
            continue
        out["valid"][i] = True
        out["conic"][i] = conic
        out["radius"][i] = radius
        out["xy"][i] = (px, py)
        out["depth"][i] = p_view[2]
        if antialiasing:
            out["opacity"][i] = ops[i] * np.sqrt(
                max(2.5e-5, det_cov / det))
    return out


def scene(n=120, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 1.5
    pts[:, 2] = 4.0 + rng.uniform(-5.5, 2.0, n)   # some behind near plane
    scales = np.exp(rng.normal(size=(n, 3)) * 0.6 - 2.0).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    ops = rng.uniform(0.05, 0.99, n).astype(np.float32)
    # a slightly rotated + translated camera (exercise the W matrix terms)
    ang = 0.2
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    cam = make_camera(R, np.array([0.1, -0.2, 0.3]), 0.9, 0.7, W_IMG, H_IMG)
    return pts, scales, quats, ops, cam


@pytest.mark.parametrize("antialiasing", [False, True])
def test_projection_matches_oracle(antialiasing):
    pts, scales, quats, ops, cam = scene()
    fx = W_IMG / (2 * cam.tan_fovx)
    fy = H_IMG / (2 * cam.tan_fovy)

    cov6 = gaussian_math.compute_cov3d(jnp.asarray(scales),
                                       jnp.asarray(quats))
    proj = gaussian_math.project_gaussians(
        jnp.asarray(pts), cov6, jnp.asarray(ops), cam.world_view,
        cam.full_proj, W_IMG, H_IMG, fx, fy, cam.tan_fovx, cam.tan_fovy,
        antialiasing=antialiasing)

    ora = oracle_preprocess(pts, scales, quats, ops, cam, fx, fy,
                            antialiasing=antialiasing)

    got_valid = np.asarray(proj.valid)
    # the production path adds one cull the oracle scene can't trip at
    # these opacities (two_l > 0); otherwise the masks must agree exactly
    np.testing.assert_array_equal(got_valid, ora["valid"])
    assert got_valid.sum() > 30 and (~got_valid).sum() > 3

    v = got_valid
    np.testing.assert_allclose(np.asarray(proj.depth)[v], ora["depth"][v],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(proj.xy)[v], ora["xy"][v],
                               rtol=1e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(proj.conic)[v], ora["conic"][v],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(proj.radius)[v],
                                  ora["radius"][v].astype(np.int32))
    np.testing.assert_allclose(np.asarray(proj.opacity)[v],
                               ora["opacity"][v], rtol=1e-5)

    # rect parity (getRect, auxiliary.h) through binning.compute_rects
    gw = -(-W_IMG // TILE)
    gh = -(-H_IMG // TILE)
    mnx, mny, rw, rh = (np.asarray(a) for a in compute_rects(
        proj.xy, proj.radius, W_IMG, H_IMG, TILE, TILE))
    for i in np.where(v)[0]:
        ex_min_x = min(gw, max(0, int((ora["xy"][i][0] - ora["radius"][i])
                                      / TILE)))
        ex_min_y = min(gh, max(0, int((ora["xy"][i][1] - ora["radius"][i])
                                      / TILE)))
        ex_max_x = min(gw, max(0, int((ora["xy"][i][0] + ora["radius"][i]
                                       + TILE - 1) / TILE)))
        ex_max_y = min(gh, max(0, int((ora["xy"][i][1] + ora["radius"][i]
                                       + TILE - 1) / TILE)))
        assert mnx[i] == ex_min_x and mny[i] == ex_min_y
        assert rw[i] == ex_max_x - ex_min_x
        assert rh[i] == ex_max_y - ex_min_y


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_sh_color_matches_oracle(deg):
    rng = np.random.default_rng(3)
    n = 40
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    pts[:, 2] += 4.0
    shs = rng.normal(size=(n, 16, 3)).astype(np.float32) * 0.4
    campos = np.array([0.2, -0.1, 0.0], np.float32)

    got = np.asarray(sh_ops.sh_color(deg, jnp.asarray(shs),
                                     jnp.asarray(pts), jnp.asarray(campos)))
    want = np.stack([oracle_sh_color(deg, shs[i].astype(np.float64),
                                     pts[i].astype(np.float64),
                                     campos.astype(np.float64))
                     for i in range(n)])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
