"""Native component tests — skipped when the shared library isn't built.

The CI/test harness builds it via cmake; these tests validate the threaded
image loader against PIL and the C++ hierarchy creator against the JAX
builder on the same input.
"""

import os
import subprocess

import numpy as np
import pytest

from hlod_gaussians_tpu import native
from hlod_gaussians_tpu.data import dhier as dhier_io, ply as ply_io

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library not built")


def _write_test_png(path, h=37, w=53):
    from PIL import Image
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    Image.fromarray(img).save(path)
    return img


def _write_test_jpg(path, h=40, w=64):
    from PIL import Image
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    Image.fromarray(img).save(path, quality=95)
    return img


def test_loader_png_matches_pil(tmp_path):
    p = str(tmp_path / "a.png")
    ref = _write_test_png(p)
    loader = native.NativeImageLoader([p], n_threads=2, max_width=0)
    got = loader.get(0)
    loader.close()
    assert got.shape == (3, ref.shape[0], ref.shape[1])
    np.testing.assert_allclose(
        got, np.transpose(ref.astype(np.float32) / 255.0, (2, 0, 1)),
        atol=1e-6)


def test_loader_jpeg_close_to_pil(tmp_path):
    p = str(tmp_path / "b.jpg")
    _write_test_jpg(p)
    loader = native.NativeImageLoader([p], n_threads=2, max_width=0)
    got = loader.get(0)
    pil = loader._pil_get(0)
    loader.close()
    assert got.shape == pil.shape
    # decoders may differ by small IDCT rounding
    assert np.abs(got - pil).mean() < 0.02


def test_loader_resize(tmp_path):
    p = str(tmp_path / "c.png")
    _write_test_png(p, h=64, w=128)
    loader = native.NativeImageLoader([p], n_threads=1, max_width=32)
    got = loader.get(0)
    loader.close()
    assert got.shape == (3, 16, 32)


def test_loader_prefetch_many(tmp_path):
    paths = []
    for i in range(8):
        p = str(tmp_path / f"i{i}.png")
        _write_test_png(p, h=16 + i, w=20)
        paths.append(p)
    loader = native.NativeImageLoader(paths, n_threads=4, max_width=0)
    loader.prefetch(list(range(8)))
    for i in range(8):
        img = loader.get(i)
        assert img.shape == (3, 16 + i, 20)
    loader.close()


def test_hierarchy_creator_matches_jax(tmp_path):
    from hlod_gaussians_tpu.hierarchy import build as hb
    from hlod_gaussians_tpu.models.gaussians import NODE_CHILD_COUNT, NODE_PARENT
    from tests.test_hierarchy_build import check_tree_invariants, random_gaussians

    rng = np.random.default_rng(5)
    n = 33
    means, scales, quats, ops, shs = random_gaussians(n, seed=5, sh_k=1)
    # write the 3DGS ply the creator consumes (opacity as logit)
    g = ply_io.GaussianPly(
        xyz=means, f_dc=shs[:, :1], f_rest=np.zeros((n, 0, 3), np.float32),
        opacity=np.log(ops / (1 - ops)).astype(np.float32),
        log_scale=np.log(scales).astype(np.float32), quat=quats)
    ply_path = str(tmp_path / "in.ply")
    ply_io.save_gaussian_ply(ply_path, g)

    out_path = str(tmp_path / "out.dhier")
    n_nodes = native.build_hierarchy_file(ply_path, out_path)
    assert n_nodes == 2 * n - 1

    d = dhier_io.load_dhier(out_path)
    assert d.nodes.shape[0] == 2 * n - 1
    # tree invariants via the same checker as the JAX builder
    leaves = d.nodes[:, NODE_CHILD_COUNT] == 0
    assert leaves.sum() == n
    roots = (d.nodes[:, NODE_PARENT] == -1).sum()
    assert roots == 1

    # parity vs the JAX builder: same leaf positions, root statistics close
    h = hb.build_hierarchy(means, scales, quats, ops, shs)
    root_cpp = int(np.where(d.nodes[:, NODE_PARENT] == -1)[0][0])
    root_jax = int(np.where(h.nodes[:, NODE_PARENT] == -1)[0][0])
    np.testing.assert_allclose(d.pos[root_cpp], h.pos[root_jax], atol=1e-3)
    np.testing.assert_allclose(np.sort(np.exp(d.log_scale[root_cpp])),
                               np.sort(h.scale[root_jax]), rtol=1e-2)
    np.testing.assert_allclose(d.opacity[root_cpp], h.opacity[root_jax],
                               rtol=1e-2)
    np.testing.assert_allclose(np.sort(d.pos[leaves], axis=0),
                               np.sort(means, axis=0), atol=1e-5)


def test_hierarchy_creator_cli(tmp_path):
    exe = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "build", "hierarchy_creator")
    if not os.path.exists(exe):
        pytest.skip("cli not built")
    n = 9
    rng = np.random.default_rng(0)
    g = ply_io.GaussianPly(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        f_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
        f_rest=np.zeros((n, 0, 3), np.float32),
        opacity=np.zeros(n, np.float32),
        log_scale=np.full((n, 3), -2.0, np.float32),
        quat=np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)))
    ply_path = str(tmp_path / "in.ply")
    ply_io.save_gaussian_ply(ply_path, g)
    out = str(tmp_path / "o.dhier")
    res = subprocess.run([exe, ply_path, out], capture_output=True, text=True)
    assert res.returncode == 0, res.stderr
    d = dhier_io.load_dhier(out)
    assert d.nodes.shape[0] == 2 * n - 1
