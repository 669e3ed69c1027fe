"""Scene-loading integration: synthetic COLMAP dir + images on disk ->
SceneInfo -> Camera pytrees -> renderable."""

import os

import numpy as np

from hlod_gaussians_tpu.data import colmap as cm
from hlod_gaussians_tpu.data.scene import load_colmap_scene, load_view


def write_scene(root, n_views=6, w=40, h=30):
    from PIL import Image

    sparse = os.path.join(root, "sparse", "0")
    img_dir = os.path.join(root, "images")
    os.makedirs(sparse)
    os.makedirs(img_dir)

    cams = {1: cm.ColmapCamera(1, "PINHOLE", w, h,
                               np.array([35.0, 35.0, w / 2, h / 2]))}
    rng = np.random.default_rng(0)
    images = {}
    for i in range(n_views):
        q = np.array([1.0, 0, 0, 0])
        t = np.array([0.1 * i, 0.0, 0.0])
        name = f"img_{i:03d}.png"
        images[i + 1] = cm.ColmapImage(i + 1, q, t, 1, name,
                                       np.zeros((0, 2)),
                                       np.zeros((0,), np.int64))
        arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))

    pts = cm.ColmapPoints(rng.normal(size=(50, 3)).astype(np.float32),
                          rng.integers(0, 255, (50, 3)).astype(np.uint8),
                          np.zeros(50, np.float32))
    cm.write_cameras_bin(os.path.join(sparse, "cameras.bin"), cams)
    cm.write_images_bin(os.path.join(sparse, "images.bin"), images)
    cm.write_points3d_bin(os.path.join(sparse, "points3D.bin"), pts)
    return pts


def test_load_colmap_scene_and_views(tmp_path):
    root = str(tmp_path / "scene")
    os.makedirs(root)
    pts = write_scene(root)

    scene = load_colmap_scene(root, eval_split=True, test_hold=3)
    assert len(scene.train_cameras) == 4
    assert len(scene.test_cameras) == 2
    assert scene.points.shape == (50, 3)
    assert scene.extent > 0

    cam = load_view(scene.train_cameras[0])
    assert cam.image.shape == (3, 30, 40)
    assert float(cam.image.max()) <= 1.0
    assert cam.width == 40 and cam.height == 30

    # camera matrices consistent: campos = inverse of W2V
    wv = np.asarray(cam.world_view)
    c2w = np.linalg.inv(wv)
    np.testing.assert_allclose(np.asarray(cam.campos), c2w[3, :3], atol=1e-5)


def test_test_txt_split(tmp_path):
    root = str(tmp_path / "scene2")
    os.makedirs(root)
    write_scene(root)
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("img_001\nimg_004\n")
    scene = load_colmap_scene(root)
    test_names = {c.image_name for c in scene.test_cameras}
    assert test_names == {"img_001", "img_004"}
    assert len(scene.train_cameras) == 4


def test_depth_reliability_gate(tmp_path):
    """med_scale gate (reference cameras.py:85-94 + dataset_readers.py:
    195-206): an image whose depth-scale fit strays outside
    [0.2, 5] x med_scale gets its depth mask zeroed; inliers keep the
    alpha-mask-folded mask; scale <= 0 disables depth entirely."""
    import json

    from PIL import Image

    root = str(tmp_path / "scene3")
    os.makedirs(root)
    write_scene(root)

    dd = os.path.join(root, "depths")
    os.makedirs(dd)
    rng = np.random.default_rng(1)
    for i in range(6):
        d16 = rng.integers(1000, 60000, (30, 40)).astype(np.uint16)
        Image.fromarray(d16).save(os.path.join(dd, f"img_{i:03d}.png"))

    # scales: img_000..004 near 1.0 (inliers), img_001 wildly off (outlier),
    # img_002 scale 0 (no fit)
    params = {f"img_{i:03d}": {"scale": 1.0 + 0.01 * i, "offset": 0.0}
              for i in range(6)}
    params["img_001"]["scale"] = 100.0
    params["img_002"]["scale"] = 0.0
    with open(os.path.join(root, "sparse", "0", "depth_params.json"),
              "w") as f:
        json.dump(params, f)

    scene = load_colmap_scene(root, depths_dir="depths")
    by_name = {c.image_name: c for c in scene.train_cameras
               + scene.test_cameras}

    assert by_name["img_000"].depth_params["med_scale"] > 0

    inlier = load_view(by_name["img_000"])
    assert inlier.invdepth is not None
    assert float(np.asarray(inlier.depth_mask).max()) == 1.0

    outlier = load_view(by_name["img_001"])
    assert outlier.invdepth is not None
    assert float(np.asarray(outlier.depth_mask).max()) == 0.0

    nofit = load_view(by_name["img_002"])
    assert nofit.invdepth is None and nofit.depth_mask is None


def test_train_test_exp_half_mask(tmp_path):
    """train_test_exp (reference dataset_readers.py:258 + cameras.py:63-67):
    test views join the train list flagged is_test, and load_view masks the
    right half of their alpha (train dataset)."""
    root = str(tmp_path / "scene4")
    os.makedirs(root)
    write_scene(root)
    scene = load_colmap_scene(root, eval_split=True, test_hold=3,
                              train_test_exp=True)
    assert len(scene.train_cameras) == 6          # 4 train + 2 test
    test_in_train = [c for c in scene.train_cameras if c.is_test]
    assert len(test_in_train) == 2

    cam = load_view(test_in_train[0], train_test_exp=True)
    a = np.asarray(cam.alpha_mask)
    w = a.shape[-1]
    assert (a[..., w // 2:] == 0).all() and (a[..., : w // 2] == 1).all()

    # without the flag nothing is masked
    cam2 = load_view(test_in_train[0])
    assert cam2.alpha_mask is None


def test_create_from_gaussian_ply(tmp_path):
    from hlod_gaussians_tpu.data import ply as ply_io
    from hlod_gaussians_tpu.models import gaussians as gm

    rng = np.random.default_rng(0)
    n = 20
    g = ply_io.GaussianPly(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=rng.normal(size=(n, 15, 3)).astype(np.float32),
        opacity=rng.normal(size=(n,)).astype(np.float32),
        log_scale=rng.normal(size=(n, 3)).astype(np.float32),
        quat=np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)))
    p = str(tmp_path / "g.ply")
    ply_io.save_gaussian_ply(p, g)
    state = gm.create_from_gaussian_ply(ply_io.load_gaussian_ply(p), 32)
    assert state.sh_degree == 3
    assert int(np.asarray(state.alive).sum()) == n
    np.testing.assert_allclose(np.asarray(state.xyz)[:n], g.xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.opacity_logit)[:n, 0],
                               g.opacity, atol=1e-6)
