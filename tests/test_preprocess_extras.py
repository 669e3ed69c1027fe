"""Known-pose / mask preprocess utilities (round-3 gap-fill):
database seeding, mask pipeline, image simplification, model alignment."""

import os

import numpy as np
import pytest

from hlod_gaussians_tpu.data import colmap as cm


def _toy_model(n_img=8, n_pts=40, seed=0):
    rng = np.random.default_rng(seed)
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 64, 48,
                               np.array([50.0, 50.0, 32.0, 24.0]))}
    images = {}
    for i in range(n_img):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        q *= np.sign(q[0] + (q[0] == 0))
        t = rng.normal(size=3)
        ids = rng.integers(-1, n_pts, size=5).astype(np.int64)
        images[i + 1] = cm.ColmapImage(
            i + 1, q, t, 1, f"im_{i:03d}.png",
            rng.uniform(0, 64, (5, 2)), ids)
    pts = cm.ColmapPointsFull(
        ids=np.arange(n_pts, dtype=np.int64),
        xyz=rng.normal(size=(n_pts, 3)).astype(np.float32),
        rgb=rng.integers(0, 255, (n_pts, 3)).astype(np.uint8),
        errors=rng.uniform(0, 3, n_pts).astype(np.float32),
        track_lens=rng.integers(0, 10, n_pts).astype(np.int64))
    return cams, images, pts


def _write_model(d, cams, images, pts_full):
    sparse = os.path.join(d, "sparse", "0")
    os.makedirs(sparse, exist_ok=True)
    cm.write_cameras_bin(os.path.join(sparse, "cameras.bin"), cams)
    cm.write_images_bin(os.path.join(sparse, "images.bin"), images)
    cm.write_points3d_bin_full(os.path.join(sparse, "points3D.bin"),
                               pts_full)


def test_points3d_full_roundtrip(tmp_path):
    _, _, pts = _toy_model()
    p = str(tmp_path / "p.bin")
    cm.write_points3d_bin_full(p, pts)
    back = cm.read_points3d_bin_full(p)
    np.testing.assert_array_equal(back.ids, pts.ids)
    np.testing.assert_allclose(back.xyz, pts.xyz, atol=1e-6)
    np.testing.assert_array_equal(back.rgb, pts.rgb)
    np.testing.assert_array_equal(back.track_lens, pts.track_lens)
    # plain reader still works on the same file
    plain = cm.read_points3d_bin(p)
    np.testing.assert_allclose(plain.xyz, pts.xyz, atol=1e-6)


def test_seed_database(tmp_path):
    from hlod_gaussians_tpu.preprocess.database import (ColmapDatabase,
                                                        seed_database)

    cams, images, pts = _toy_model()
    root = str(tmp_path / "m")
    _write_model(root, cams, images, pts)
    db_path = str(tmp_path / "colmap.db")
    n = seed_database(os.path.join(root, "sparse", "0"), db_path)
    assert n == len(images)

    db = ColmapDatabase(db_path)
    got_cams = db.cameras()
    assert set(got_cams) == {1}
    mid, w, h, params = got_cams[1]
    assert (mid, w, h) == (1, 64, 48)
    np.testing.assert_allclose(params, cams[1].params)
    got_imgs = db.images()
    assert set(got_imgs) == set(images)
    for iid, (name, cam_id) in got_imgs.items():
        assert name == images[iid].name and cam_id == 1
    db.close()
    # idempotent: reseeding over an existing file must not duplicate
    assert seed_database(os.path.join(root, "sparse", "0"), db_path) == n


def test_mask_pipeline(tmp_path):
    from PIL import Image

    from hlod_gaussians_tpu.preprocess import masks

    rng = np.random.default_rng(0)
    h, w = 24, 32
    rgba = np.zeros((h, w, 4), np.uint8)
    rgba[..., :3] = rng.integers(1, 255, (h, w, 3))
    rgba[4:20, 8:28, 3] = 255            # opaque block, transparent border

    mask = masks.alpha_to_mask(rgba)
    assert set(np.unique(mask)) <= {0, 255}
    # erosion shrinks the opaque block by one pixel on each side
    assert mask[5, 9] == 255 and mask[4, 8] == 0

    img = rgba[..., :3].copy()
    out = masks.apply_mask(img, mask)
    # dilation(5x5) re-grows the eroded mask: interior pixels survive
    assert (out[6:18, 10:26] > 0).any()
    # far outside the mask everything is black
    assert (out[0:2, 0:4] == 0).all()

    # dir-level drivers
    in_dir = str(tmp_path / "in")
    mask_dir = str(tmp_path / "masks")
    os.makedirs(in_dir)
    os.makedirs(mask_dir)
    Image.fromarray(rgba).save(os.path.join(in_dir, "a.png"))
    assert masks.make_masks(in_dir, mask_dir) == 1
    assert masks.apply_masks(in_dir, mask_dir) == 1
    back = np.asarray(Image.open(os.path.join(in_dir, "a.png")))
    assert (back[0:2, 0:4] == 0).all()


def test_simplify_images(tmp_path):
    from hlod_gaussians_tpu.preprocess.simplify import (simplify_images,
                                                        simplify_images_file)

    cams, images, pts = _toy_model(n_img=10)
    # image 3: no observations at all -> dropped
    im3 = images[3]
    images[3] = cm.ColmapImage(im3.id, im3.qvec, np.asarray(im3.tvec),
                               im3.camera_id, im3.name,
                               np.zeros((0, 2)), np.zeros((0,), np.int64))
    # image 5: isolated camera (100x the cluster scale) -> dropped
    im5 = images[5]
    images[5] = cm.ColmapImage(im5.id, im5.qvec,
                               np.array([500.0, 500.0, 500.0]),
                               im5.camera_id, im5.name, im5.xys,
                               im5.point3d_ids)
    # image 7: ONLY invalid (-1) observations -> dropped
    im7 = images[7]
    images[7] = cm.ColmapImage(im7.id, im7.qvec, np.asarray(im7.tvec),
                               im7.camera_id, im7.name, im7.xys,
                               np.full(im7.point3d_ids.shape, -1, np.int64))

    out = simplify_images(images)
    assert 3 not in out and 5 not in out and 7 not in out
    for k, im in out.items():
        assert (im.point3d_ids >= 0).all()

    root = str(tmp_path / "m")
    _write_model(root, cams, images, pts)
    base = os.path.join(root, "sparse", "0")
    n = simplify_images_file(base)
    assert n == len(out)
    assert os.path.exists(os.path.join(base, "images_heavy.bin"))
    back = cm.read_images_bin(os.path.join(base, "images.bin"),
                              load_points=True)
    assert set(back) == set(out)


def test_procrustes_recovers_sim3():
    from hlod_gaussians_tpu.preprocess.transform import (apply_sim3,
                                                         procrustes)

    rng = np.random.default_rng(3)
    x0 = rng.normal(size=(50, 3)).astype(np.float32)
    ang = 0.7
    r_true = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0],
                       [0, 0, 1]], np.float32)
    x1 = (x0 * 2.5) @ r_true.T + np.array([1.0, -2.0, 0.5], np.float32)
    sim3 = procrustes(x0, x1)
    np.testing.assert_allclose(apply_sim3(sim3, x1), x0, atol=1e-4)


def test_transform_colmap(tmp_path):
    from hlod_gaussians_tpu.preprocess.transform import transform_colmap

    rng = np.random.default_rng(4)
    cams, old_images, _ = _toy_model(n_img=12, seed=5)

    # new model = old model rotated/scaled/translated, with one outlier cam
    ang = 0.4
    r = np.array([[np.cos(ang), 0, np.sin(ang)],
                  [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    s, t = 3.0, np.array([5.0, 1.0, -2.0])

    def to_new_frame(x):
        return (x @ r.T) * s + t

    new_images = {}
    for k, im in old_images.items():
        center_old = -cm.qvec2rotmat(im.qvec).T @ im.tvec
        center_new = to_new_frame(center_old)
        r_new = cm.qvec2rotmat(im.qvec) @ r.T
        if k == 4:   # outlier: COLMAP mis-registered this camera
            center_new = center_new + 500.0
        new_images[k] = cm.ColmapImage(
            im.id, cm.rotmat2qvec(r_new), -r_new @ center_new,
            im.camera_id, im.name, im.xys, im.point3d_ids)

    n_pts = 30
    xyz_old = rng.normal(size=(n_pts, 3)).astype(np.float32)
    errors = np.full(n_pts, 0.5, np.float32)
    errors[:5] = 9.0                       # high-error points -> filtered
    tracks = np.full(n_pts, 6, np.int64)
    tracks[5:8] = 1                        # under-observed -> filtered
    new_pts = cm.ColmapPointsFull(
        ids=np.arange(n_pts, dtype=np.int64),
        xyz=to_new_frame(xyz_old).astype(np.float32),
        rgb=np.full((n_pts, 3), 128, np.uint8),
        errors=errors, track_lens=tracks)

    in_dir = str(tmp_path / "old")
    new_dir = str(tmp_path / "new")
    out_dir = str(tmp_path / "out")
    _write_model(in_dir, cams, old_images,
                 cm.ColmapPointsFull(np.zeros(0, np.int64),
                                     np.zeros((0, 3), np.float32),
                                     np.zeros((0, 3), np.uint8),
                                     np.zeros(0, np.float32),
                                     np.zeros(0, np.int64)))
    _write_model(new_dir, cams, new_images, new_pts)
    for aux, val in (("center.txt", "0 0 0"), ("extent.txt", "10 10 10")):
        with open(os.path.join(in_dir, aux), "w") as f:
            f.write(val + "\n")

    transform_colmap(in_dir, new_dir, out_dir)

    out_imgs = cm.read_images_bin(
        os.path.join(out_dir, "sparse/0/images.bin"))
    assert 4 not in out_imgs           # outlier camera dropped
    # surviving cameras land back on the OLD centers
    for k, im in out_imgs.items():
        center = -cm.qvec2rotmat(im.qvec).T @ im.tvec
        old_center = (-cm.qvec2rotmat(old_images[k].qvec).T
                      @ old_images[k].tvec)
        np.testing.assert_allclose(center, old_center, atol=1e-3)

    out_pts = cm.read_points3d_bin_full(
        os.path.join(out_dir, "sparse/0/points3D.bin"))
    assert out_pts.xyz.shape[0] == n_pts - 8
    keep = (errors < 1.5) & (tracks > 3)
    np.testing.assert_allclose(out_pts.xyz, xyz_old[keep], atol=1e-3)
    assert os.path.exists(os.path.join(out_dir, "center.txt"))
