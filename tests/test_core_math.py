"""Unit tests for SH, quaternions, covariance/projection, SSIM, Morton, KNN."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hlod_gaussians_tpu.ops import sh, quaternion, gaussian_math, ssim, morton, knn
from hlod_gaussians_tpu.utils import camera as cam_utils


def rand(*shape, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)


class TestSH:
    def test_dc_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        assert jnp.allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree0_is_constant(self):
        coeffs = rand(5, 16, 3, seed=1)
        dirs = rand(5, 3, seed=2)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeffs, dirs)
        expected = sh.C0 * coeffs[:, 0, :]
        np.testing.assert_allclose(out, expected, rtol=1e-6)

    def test_parseval_degree1(self):
        # integrating |Y_1m|^2 over the sphere = 1 for orthonormal basis;
        # here just check antisymmetry: deg-1 terms flip with direction.
        coeffs = jnp.zeros((1, 4, 3)).at[:, 1:, :].set(rand(1, 3, 3, seed=3))
        d = jnp.array([[0.0, 0.0, 1.0]])
        a = sh.eval_sh(1, coeffs, d)
        b = sh.eval_sh(1, coeffs, -d)
        np.testing.assert_allclose(np.asarray(a), np.asarray(-b), rtol=1e-5)

    def test_clamp_and_offset(self):
        coeffs = jnp.zeros((1, 1, 3)).at[0, 0].set(jnp.array([-10.0, 0.0, 10.0]))
        col = sh.sh_color(0, coeffs, jnp.array([[0.0, 0.0, 5.0]]), jnp.zeros(3))
        assert col[0, 0] == 0.0          # clamped
        assert abs(col[0, 1] - 0.5) < 1e-6  # +0.5 offset


class TestQuaternion:
    def test_matrix_roundtrip(self):
        q = quaternion.normalize(rand(100, 4, seed=4))
        m = quaternion.to_matrix(q)
        # orthonormality
        eye = jnp.broadcast_to(jnp.eye(3), m.shape)
        np.testing.assert_allclose(np.asarray(m @ jnp.swapaxes(m, -1, -2)), np.asarray(eye), atol=1e-5)
        q2 = quaternion.from_matrix(m)
        m2 = quaternion.to_matrix(q2)
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m), atol=1e-5)

    def test_multiply_matches_matrix_product(self):
        a = quaternion.normalize(rand(10, 4, seed=5))
        b = quaternion.normalize(rand(10, 4, seed=6))
        m_ab = quaternion.to_matrix(quaternion.multiply(a, b))
        m_a = quaternion.to_matrix(a)
        m_b = quaternion.to_matrix(b)
        np.testing.assert_allclose(np.asarray(m_ab), np.asarray(m_a @ m_b), atol=1e-5)


class TestCov:
    def test_cov3d_isotropic(self):
        s = jnp.array([[2.0, 2.0, 2.0]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov = gaussian_math.compute_cov3d(s, q)
        np.testing.assert_allclose(np.asarray(cov), np.asarray(jnp.array([[4.0, 0, 0, 4.0, 0, 4.0]])), atol=1e-6)

    def test_cov3d_rotation_invariant_trace(self):
        s = jnp.array([[1.0, 2.0, 3.0]])
        q = quaternion.normalize(rand(1, 4, seed=7))
        cov = gaussian_math.compute_cov3d(s, q)
        trace = cov[0, 0] + cov[0, 3] + cov[0, 5]
        np.testing.assert_allclose(float(trace), 1.0 + 4.0 + 9.0, rtol=1e-5)

    def test_cov3d_eigvals_are_squared_scales(self):
        s = jnp.array([[0.5, 1.5, 2.5]])
        q = quaternion.normalize(rand(1, 4, seed=8))
        m = gaussian_math.unpack_cov3d(gaussian_math.compute_cov3d(s, q))
        ev = np.sort(np.linalg.eigvalsh(np.asarray(m[0])))
        np.testing.assert_allclose(ev, np.asarray(jnp.sort(s[0]) ** 2), rtol=1e-5)


class TestProjection:
    def _simple_camera(self, w=64, h=48, fov=1.0):
        R = np.eye(3)
        t = np.zeros(3)
        return cam_utils.make_camera(R, t, fov, fov, w, h)

    def test_center_point_projects_to_image_center(self):
        cam = self._simple_camera()
        means = jnp.array([[0.0, 0.0, 5.0]])
        p_proj, _ = gaussian_math.transform_points(means, cam.full_proj)
        xy = gaussian_math.ndc2pix(p_proj[:, :2], jnp.array([cam.width, cam.height]))
        np.testing.assert_allclose(np.asarray(xy[0]), [(64 - 1) / 2, (48 - 1) / 2], atol=1e-4)

    def test_depth_is_view_z(self):
        cam = self._simple_camera()
        means = jnp.array([[0.3, -0.2, 7.5]])
        view_z = gaussian_math.transform_points_3x4(means, cam.world_view)[0, 2]
        np.testing.assert_allclose(float(view_z), 7.5, atol=1e-5)

    def test_project_gaussians_culls_near(self):
        cam = self._simple_camera()
        means = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 0.1], [0.0, 0.0, -3.0]])
        cov6 = gaussian_math.compute_cov3d(jnp.full((3, 3), 0.1), jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1)))
        proj = gaussian_math.project_gaussians(
            means, cov6, jnp.ones(3), cam.world_view, cam.full_proj,
            cam.width, cam.height, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
        assert bool(proj.valid[0])
        assert not bool(proj.valid[1])
        assert not bool(proj.valid[2])

    def test_isotropic_radius_matches_analytic(self):
        # An isotropic Gaussian of world sigma s at depth z has screen-space
        # sigma ~= focal * s / z; radius = ceil(3 * sqrt(sigma^2 + 0.3)).
        cam = self._simple_camera(w=640, h=480, fov=1.0)
        s = 0.05
        z = 4.0
        means = jnp.array([[0.0, 0.0, z]])
        cov6 = gaussian_math.compute_cov3d(jnp.array([[s, s, s]]), jnp.array([[1.0, 0, 0, 0]]))
        proj = gaussian_math.project_gaussians(
            means, cov6, jnp.ones(1), cam.world_view, cam.full_proj,
            cam.width, cam.height, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
        sigma_px = float(cam.focal_x) * s / z
        expect = np.ceil(3.0 * np.sqrt(sigma_px ** 2 + 0.3))
        assert int(proj.radius[0]) == int(expect)

    def test_conic_is_inverse_of_dilated_cov(self):
        cam = self._simple_camera()
        means = rand(20, 3, seed=9, scale=0.3) + jnp.array([0.0, 0.0, 6.0])
        cov6 = gaussian_math.compute_cov3d(
            jnp.exp(rand(20, 3, seed=10, scale=0.3)) * 0.05,
            quaternion.normalize(rand(20, 4, seed=11)))
        cov2 = gaussian_math.compute_cov2d(means, cov6, cam.world_view,
                                           cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
        proj = gaussian_math.project_gaussians(
            means, cov6, jnp.ones(20), cam.world_view, cam.full_proj,
            cam.width, cam.height, cam.focal_x, cam.focal_y, cam.tan_fovx, cam.tan_fovy)
        a = cov2[:, 0] + 0.3
        b = cov2[:, 1]
        c = cov2[:, 2] + 0.3
        det = a * c - b * b
        np.testing.assert_allclose(np.asarray(proj.conic),
                                   np.stack([c / det, -b / det, a / det], -1), rtol=1e-4)


class TestSSIM:
    def test_identical_images(self):
        img = jnp.clip(rand(3, 32, 32, seed=12) * 0.2 + 0.5, 0, 1)
        assert float(ssim.ssim(img, img)) > 0.9999

    def test_noise_lowers_ssim(self):
        img = jnp.clip(rand(3, 32, 32, seed=13) * 0.2 + 0.5, 0, 1)
        noisy = jnp.clip(img + rand(3, 32, 32, seed=14) * 0.2, 0, 1)
        assert float(ssim.ssim(img, noisy)) < 0.9

    def test_constant_images_interior(self):
        # On constant images, away from the zero-padded border, SSIM has the
        # closed form ((2 mu1 mu2 + c1) c2) / ((mu1^2 + mu2^2 + c1) c2).
        # Check the interior of the map via a large image: border effects
        # shrink as 10/N of pixels.
        img1 = jnp.full((1, 256, 256), 0.4)
        img2 = jnp.full((1, 256, 256), 0.6)
        c1 = 0.01 ** 2
        expected = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
        np.testing.assert_allclose(float(ssim.ssim(img1, img2)), expected, rtol=2e-2)

    def test_psnr(self):
        img = jnp.zeros((3, 8, 8))
        noisy = img + 0.1
        np.testing.assert_allclose(float(ssim.psnr(img, noisy)), 20.0, atol=1e-4)


class TestMorton:
    def test_order_locality(self):
        pts = rand(256, 3, seed=15)
        perm = morton.morton_argsort(pts)
        sorted_pts = np.asarray(pts)[np.asarray(perm)]
        # consecutive Morton neighbors should be much closer than random pairs
        d_consec = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
        rng = np.random.default_rng(0)
        ri = rng.permutation(256)
        d_rand = np.linalg.norm(sorted_pts[ri[:-1]] - sorted_pts[ri[1:]], axis=1).mean()
        assert d_consec < 0.5 * d_rand

    def test_axis_order(self):
        # points along one axis sort monotonically — EXCEPT the exact-max
        # point, whose quantized coordinate hits 2^21 and wraps to code 0
        # (the reference's truncation-overflow quirk, morton.cu:29-40,
        # reproduced for order parity); it ties with point 0 and lands at
        # the front of the order
        pts = jnp.stack([jnp.linspace(0, 1, 64), jnp.zeros(64), jnp.zeros(64)], axis=-1)
        perm = np.asarray(morton.morton_argsort(pts))
        assert set(perm[:2].tolist()) == {0, 63}
        assert (perm[2:] == np.arange(1, 63)).all()


class TestKNN:
    def test_grid_points(self):
        # regular 1D grid along x: 3-NN mean sq dist = (1 + 1 + 4)/3 * h^2
        n = 64
        h = 0.1
        pts = jnp.stack([jnp.arange(n) * h, jnp.zeros(n), jnp.zeros(n)], axis=-1)
        d = knn.knn_mean_sq_dist(pts, k=3, window=8)
        interior = np.asarray(d)[2:-2]
        np.testing.assert_allclose(interior, (h ** 2 + h ** 2 + 4 * h ** 2) / 3, rtol=1e-4)

    def test_matches_bruteforce(self):
        pts = rand(200, 3, seed=16)
        d = np.asarray(knn.knn_mean_sq_dist(pts, k=3, window=32))
        p = np.asarray(pts)
        d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        exact = np.sort(d2, axis=1)[:, :3].mean(1)
        # approximate: demand 95% exact matches and all within 2x
        frac = np.mean(np.isclose(d, exact, rtol=1e-4))
        assert frac > 0.9
        assert (d <= exact * 4 + 1e-6).all()


def test_morton_order_matches_reference_transcription():
    """ops/morton.py vs a verbatim numpy transcription of the reference
    getMortonCodeCUDA (morton.cu:8-45: normalize to the AABB, scale by
    2^21, TRUNCATE to int64, interleave x->bit 3i, y->3i+1, z->3i+2).
    The behavioral contract (sort_morton's ordering) must agree."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(-5, 7, size=(4096, 3)).astype(np.float32)

    mn = pts.min(axis=0)
    mx = pts.max(axis=0)
    box = mx - mn
    p = ((pts - mn) / box * (1 << 21)).astype(np.float32)
    pi = p.astype(np.int64)                      # C truncation semantics
    code = np.zeros(pts.shape[0], np.int64)
    for i in range(21):
        code |= ((pi[:, 0] >> i) & 1) << (3 * i)
        code |= ((pi[:, 1] >> i) & 1) << (3 * i + 1)
        code |= ((pi[:, 2] >> i) & 1) << (3 * i + 2)
    assert np.unique(code).size == code.size     # no ties: order well-defined

    ref_order = np.argsort(code, kind="stable")
    got_order = np.asarray(morton.morton_argsort(jnp.asarray(pts)))
    np.testing.assert_array_equal(got_order, ref_order)
