"""IO round-trip tests: gaussian PLY, point PLY, .dhier, .hier, COLMAP."""

import numpy as np

from hlod_gaussians_tpu.data import colmap as cm
from hlod_gaussians_tpu.data import dhier as dh
from hlod_gaussians_tpu.data import ply as ply_io


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, k = 17, 15
    g = ply_io.GaussianPly(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=rng.normal(size=(n, k, 3)).astype(np.float32),
        opacity=rng.normal(size=(n,)).astype(np.float32),
        log_scale=rng.normal(size=(n, 3)).astype(np.float32),
        quat=rng.normal(size=(n, 4)).astype(np.float32))
    p = str(tmp_path / "g.ply")
    ply_io.save_gaussian_ply(p, g)
    g2 = ply_io.load_gaussian_ply(p)
    for a, b in zip(g, g2):
        np.testing.assert_array_equal(a, b)


def test_points_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(31, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (31, 3)).astype(np.float32)
    p = str(tmp_path / "p.ply")
    ply_io.save_points_ply(p, pts, cols)
    pts2, cols2 = ply_io.load_points_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255.0)


def test_dhier_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    g, n, deg = 9, 9, 2
    k = (deg + 1) ** 2
    h = dh.DHier(
        sh_degree=deg,
        pos=rng.normal(size=(g, 3)).astype(np.float32),
        quat=rng.normal(size=(g, 4)).astype(np.float32),
        log_scale=rng.normal(size=(g, 3)).astype(np.float32),
        opacity=rng.normal(size=(g,)).astype(np.float32),
        shs=rng.normal(size=(g, k, 3)).astype(np.float32),
        nodes=rng.integers(-1, 10, size=(n, 6)).astype(np.int32))
    p = str(tmp_path / "h.dhier")
    dh.save_dhier(p, h)
    h2 = dh.load_dhier(p)
    assert h2.sh_degree == deg
    for a, b in zip(h[1:], h2[1:]):
        np.testing.assert_array_equal(a, b)


def test_hier_roundtrip_uncompressed(tmp_path):
    rng = np.random.default_rng(3)
    p_, n = 7, 7
    h = dh.UpstreamHier(
        pos=rng.normal(size=(p_, 3)).astype(np.float32),
        quat=rng.normal(size=(p_, 4)).astype(np.float32),
        log_scale=rng.normal(size=(p_, 3)).astype(np.float32),
        opacity=rng.normal(size=(p_,)).astype(np.float32),
        shs=rng.normal(size=(p_, 16, 3)).astype(np.float32),
        nodes=rng.integers(-1, 7, size=(n, 7)).astype(np.int32),
        boxes=rng.normal(size=(n, 2, 4)).astype(np.float32))
    path = str(tmp_path / "m.hier")
    dh.save_hier(path, h)
    h2 = dh.load_hier(path)
    for a, b in zip(h, h2):
        np.testing.assert_array_equal(a, b)


def test_hier_roundtrip_compressed(tmp_path):
    rng = np.random.default_rng(4)
    p_, n = 5, 5
    h = dh.UpstreamHier(
        pos=rng.normal(size=(p_, 3)).astype(np.float32),
        quat=rng.normal(size=(p_, 4)).astype(np.float32),
        log_scale=rng.normal(size=(p_, 3)).astype(np.float32),
        opacity=rng.uniform(0, 1, size=(p_,)).astype(np.float32),
        shs=rng.normal(size=(p_, 16, 3)).astype(np.float32),
        nodes=rng.integers(0, 5, size=(n, 7)).astype(np.int32),
        boxes=rng.normal(size=(n, 2, 4)).astype(np.float32))
    path = str(tmp_path / "c.hier")
    dh.save_hier(path, h, compressed=True)
    h2 = dh.load_hier(path)
    np.testing.assert_array_equal(h2.pos, h.pos)          # pos stays f32
    np.testing.assert_allclose(h2.quat, h.quat, atol=2e-3)
    np.testing.assert_array_equal(h2.nodes, h.nodes)
    np.testing.assert_allclose(h2.boxes, h.boxes, atol=2e-2)


def test_colmap_bin_roundtrip(tmp_path):
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 510.0, 320.0, 240.0]))}
    rng = np.random.default_rng(5)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    imgs = {3: cm.ColmapImage(3, q, rng.normal(size=3), 1, "im_001.jpg",
                              np.zeros((0, 2)), np.zeros((0,), np.int64))}
    pts = cm.ColmapPoints(rng.normal(size=(11, 3)).astype(np.float32),
                          rng.integers(0, 255, (11, 3)).astype(np.uint8),
                          rng.uniform(0, 1, 11).astype(np.float32))
    cm.write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    cm.write_images_bin(str(tmp_path / "images.bin"), imgs)
    cm.write_points3d_bin(str(tmp_path / "points3D.bin"), pts)

    cams2, imgs2, pts2 = cm.read_model(str(tmp_path))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    np.testing.assert_allclose(imgs2[3].qvec, q)
    assert imgs2[3].name == "im_001.jpg"
    np.testing.assert_allclose(pts2.xyz, pts.xyz, atol=1e-6)
    np.testing.assert_array_equal(pts2.rgb, pts.rgb)


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(6)
    for _ in range(10):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = cm.qvec2rotmat(q)
        q2 = cm.rotmat2qvec(R)
        assert np.allclose(q, q2, atol=1e-6) or np.allclose(q, -q2, atol=1e-6)


def test_reference_dhier_interop():
    """If the reference repo ships a .dhier fixture, load it."""
    import glob
    files = glob.glob("/root/reference/**/*.dhier", recursive=True)
    for f in files[:1]:
        h = dh.load_dhier(f)
        assert h.pos.shape[0] == h.nodes.shape[0]
