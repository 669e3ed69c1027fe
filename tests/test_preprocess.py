"""Preprocess + reorder tests: plane fit, reorientation, depth-scale fit,
Morton storage sort, occlusion culling."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.data import colmap as cm
from hlod_gaussians_tpu.models import gaussians as gm, reorder
from hlod_gaussians_tpu.preprocess import calibrate, depth_scale, reorient


def make_images(centers, look_down=False):
    out = {}
    for i, c in enumerate(centers):
        R = np.eye(3)
        T = -R @ c
        out[i] = cm.ColmapImage(i, cm.rotmat2qvec(R), T, 0, f"im{i}.jpg",
                                np.zeros((0, 2)), np.zeros((0,), np.int64))
    return out


def test_plane_fit_recovers_tilt():
    rng = np.random.default_rng(0)
    # points on the plane z = 0.3x - 0.2y + 1 with noise
    xy = rng.uniform(-5, 5, (200, 2))
    z = 0.3 * xy[:, 0] - 0.2 * xy[:, 1] + 1 + rng.normal(0, 0.01, 200)
    pts = np.c_[xy, z]
    normal, in_plane, centroid = reorient.fit_plane_least_squares(pts)
    expect = np.array([0.3, -0.2, -1.0])
    expect /= np.linalg.norm(expect)
    assert abs(abs(normal @ expect) - 1.0) < 1e-3
    assert abs(normal @ in_plane) < 1e-6


def test_auto_reorient_levels_cameras():
    rng = np.random.default_rng(1)
    # cameras on a tilted plane
    xy = rng.uniform(-10, 10, (40, 2))
    z = 0.5 * xy[:, 0] + 2.0
    centers = np.c_[xy, z]
    images = make_images(centers)
    pts = cm.ColmapPoints(
        (centers + rng.normal(0, 0.5, centers.shape)).astype(np.float32),
        np.zeros((40, 3), np.uint8), np.zeros(40, np.float32))

    new_images, new_points, rot, scale = reorient.auto_reorient(
        {}, images, pts, target_med_dist=20.0)

    # camera centers after transform lie near a z=const plane
    new_centers = []
    for im in new_images.values():
        R = cm.qvec2rotmat(im.qvec)
        Rt = np.eye(4)
        Rt[:3, :3] = R
        Rt[:3, 3] = im.tvec
        new_centers.append(np.linalg.inv(Rt)[:3, 3])
    new_centers = np.stack(new_centers)
    z_spread = new_centers[:, 2].std()
    xy_spread = new_centers[:, :2].std()
    assert z_spread < 0.05 * xy_spread


def test_depth_scale_fit_recovers_affine():
    rng = np.random.default_rng(2)
    w, h = 64, 48
    cam = cm.ColmapCamera(0, "PINHOLE", w, h,
                          np.array([50.0, 50.0, w / 2, h / 2]))

    # dense ground-truth depth field, smooth over the image
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    depth_grid = 4.0 + 0.05 * xx + 0.02 * yy
    inv_true = 1.0 / depth_grid

    # mono inverse-depth map = affine transform of the true inverse depth
    true_scale, true_offset = 3.0, 0.05
    inv_mono_map = ((inv_true - true_offset) / true_scale).astype(np.float32)

    # SfM points sampled on integer pixels, backprojected from depth_grid
    n = 200
    xi = rng.integers(0, w, n)
    yi = rng.integers(0, h, n)
    depth = depth_grid[yi, xi]
    xy = np.c_[xi, yi].astype(np.float64)
    pts = np.c_[(xy[:, 0] - w / 2) / 50.0 * depth,
                (xy[:, 1] - h / 2) / 50.0 * depth, depth]
    img = cm.ColmapImage(0, np.array([1.0, 0, 0, 0]), np.zeros(3), 0,
                         "im.jpg", xy, np.arange(n))

    got = depth_scale.fit_depth_scale(img, cam, pts, inv_mono_map)
    assert abs(got["scale"] - true_scale) / true_scale < 0.05, got
    inv_est = inv_mono_map[yi, xi] * got["scale"] + got["offset"]
    err = np.abs(inv_est - 1.0 / depth)
    assert np.median(err) < 0.005, got


def test_sort_morton_preserves_render_semantics():
    from tests.test_mcmc import hier_state, check_invariants
    st, m = hier_state(n=33, cap=128)
    from hlod_gaussians_tpu import optim
    adam = optim.init_adam(st.params())

    xyz_before = np.array(st.xyz)
    alive_before = np.array(st.alive)
    st2, adam2 = reorder.sort_morton(st, adam)
    # same multiset of live rows
    a2 = np.asarray(st2.alive)
    assert a2.sum() == alive_before.sum()
    np.testing.assert_allclose(
        np.sort(np.asarray(st2.xyz)[a2], axis=0),
        np.sort(xyz_before[alive_before], axis=0), atol=1e-6)
    check_invariants(st2)
    # live rows are contiguous from the front
    live_idx = np.where(a2)[0]
    assert live_idx.max() == len(live_idx) - 1


def test_occlusion_cull_drops_hidden():
    # several stacked opaque walls saturate transmittance (alpha is capped
    # at 0.99 per splat, forward.cu:545) in front of a small gaussian
    pts = np.array([[0, 0, 2.0], [0, 0, 2.1], [0, 0, 2.2],
                    [0, 0, 6.0]], np.float32)
    cols = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]], np.float32)
    st = gm.create_from_points(pts, cols, capacity=8, sh_degree=0,
                               opacity_init=0.999)
    ls = st.log_scale.at[:3].set(jnp.log(2.0)).at[3].set(jnp.log(0.05))
    st = dataclasses.replace(st, log_scale=ls)
    from hlod_gaussians_tpu.utils.camera import make_camera
    cam = make_camera(np.eye(3), np.zeros(3), 0.9, 0.9, 64, 64)
    keep = reorder.occlusion_cull(
        st, st.alive, cam.world_view, cam.full_proj, cam.campos,
        cam.tan_fovx, cam.tan_fovy, width=64, height=64, k_max=64)
    keep = np.asarray(keep)
    assert keep[0] and not keep[3]


class TestCalibrationCommands:
    """Command assembly is testable without COLMAP via runner injection."""

    def _capture(self):
        cmds = []
        return cmds, cmds.append

    def test_calibration_uses_matches_importer_not_exhaustive(self, tmp_path):
        import os
        img = tmp_path / "inputs" / "images"
        img.mkdir(parents=True)
        for i in range(4):
            (img / f"im{i}.jpg").write_bytes(b"x")
        cmds, cap = self._capture()
        calibrate.run_calibration(str(tmp_path), runner=cap)
        names = [c[1] for c in cmds]
        assert "matches_importer" in names
        assert "exhaustive_matcher" not in names
        assert names.index("feature_extractor") < names.index("matches_importer")
        # the match list was written and is non-trivial
        ml = [c for c in cmds if c[1] == "matches_importer"][0]
        path = ml[ml.index("--match_list_path") + 1]
        pairs = open(path).read().strip().splitlines()
        assert len(pairs) == 6  # C(4,2) sequential window

    def test_chunk_refinement_two_rounds(self, tmp_path):
        import os
        raw = tmp_path / "raw"
        (raw / "sparse" / "0").mkdir(parents=True)
        cmds, cap = self._capture()
        calibrate.refine_chunk(str(raw), str(tmp_path / "out"),
                               str(tmp_path / "imgs"),
                               image_names=[f"i{k}.jpg" for k in range(5)],
                               runner=cap)
        names = [c[1] for c in cmds]
        assert names.count("point_triangulator") == 2
        assert names.count("bundle_adjuster") == 2
        # triangulate -> adjust -> triangulate -> adjust ordering
        seq = [n for n in names if n in ("point_triangulator",
                                         "bundle_adjuster")]
        assert seq == ["point_triangulator", "bundle_adjuster",
                       "point_triangulator", "bundle_adjuster"]
        # intrinsics frozen during BA (prepare_chunk.py flags)
        ba = [c for c in cmds if c[1] == "bundle_adjuster"][0]
        assert "--BundleAdjustment.refine_focal_length" in ba
        assert ba[ba.index("--BundleAdjustment.refine_focal_length") + 1] == "0"

    def test_depth_generator_commands(self, tmp_path):
        imgs = tmp_path / "rect"
        (imgs / "cam0").mkdir(parents=True)
        (imgs / "cam1").mkdir(parents=True)
        cmds, cap = self._capture()
        calibrate.run_depth_generator(str(imgs), str(tmp_path / "depth"),
                                      generator="Depth-Anything-V2",
                                      generator_dir="/x", runner=cap)
        assert len(cmds) == 2   # one per camera folder
        assert all("--pred-only" in c for c in cmds)


class TestBlurFilter:
    def test_laplacian_variance_sharp_vs_blurred(self):
        rng = np.random.default_rng(0)
        sharp = rng.random((64, 64)).astype(np.float32)
        # heavy box blur
        blurred = sharp.copy()
        for _ in range(8):
            blurred = 0.25 * (np.roll(blurred, 1, 0) + np.roll(blurred, -1, 0)
                              + np.roll(blurred, 1, 1) + np.roll(blurred, -1, 1))
        assert calibrate.laplacian_variance(sharp) > \
            10 * calibrate.laplacian_variance(blurred)

    def test_blur_filter_mask(self):
        rng = np.random.default_rng(1)
        sharp = [rng.random((32, 32)).astype(np.float32) for _ in range(3)]
        flat = [np.full((32, 32), 0.5, np.float32)]
        mask = calibrate.blur_filter_mask(sharp + flat, lapla_thresh=0.5)
        assert mask[:3].all() and not mask[3]
        # disabled threshold keeps everything
        assert calibrate.blur_filter_mask(sharp + flat, 0.0).all()
