"""Chunk merge + chunking tests."""

import numpy as np

from hlod_gaussians_tpu.data.dhier import DHier
from hlod_gaussians_tpu.hierarchy import build as hb
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)
from hlod_gaussians_tpu.pipeline import chunking, merge


def chunk_dhier(offset, n=17, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 0.5 + offset
    scales = np.full((n, 3), 0.05, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = rng.uniform(0.4, 0.9, n).astype(np.float32)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32)
    h = hb.build_hierarchy(pts, scales, quats, ops, shs)
    return DHier(sh_degree=0, pos=h.pos, quat=h.quat,
                 log_scale=np.log(np.maximum(h.scale, 1e-9)).astype(np.float32),
                 opacity=np.clip(h.opacity, 0.01, 0.99).astype(np.float32),
                 shs=h.sh.astype(np.float32), nodes=h.nodes)


def walk(nodes, root):
    seen = []
    stack = [root]
    while stack:
        i = stack.pop()
        seen.append(i)
        if nodes[i, NODE_CHILD_COUNT] > 0:
            c = nodes[i, NODE_FIRST_CHILD]
            for _ in range(nodes[i, NODE_CHILD_COUNT]):
                stack.append(c)
                c = nodes[c, NODE_NEXT_SIBLING]
    return seen


def test_chunk_weight_falloff():
    centers = np.array([[0, 0, 0], [10, 0, 0]], np.float32)
    pos = np.array([[0, 0, 0], [4.0, 0, 0], [5.0, 0, 0], [6.0, 0, 0],
                    [10.0, 0, 0]], np.float32)
    w = merge.chunk_weight(pos, 0, centers)
    assert w[0] == 1.0          # at own center
    assert w[1] == 1.0          # clearly inside
    assert 0.0 < w[2] < 1.0     # on the equidistance surface
    assert abs(w[2] - 0.5) < 1e-5
    assert w[3] == 0.0          # clearly other side
    assert w[4] == 0.0


def test_merge_two_chunks():
    # overlapping chunks so some gaussians fall beyond the equidistance
    # falloff and get dropped
    d0 = chunk_dhier(np.array([0, 0, 0], np.float32), seed=1)
    d1 = chunk_dhier(np.array([1.5, 0, 0], np.float32), seed=2)
    centers = np.array([[0, 0, 0], [1.5, 0, 0]], np.float32)
    m = merge.merge_hierarchies([d0, d1], centers)

    nodes = m.nodes
    # single global root with the chunk roots as children
    roots = np.where(nodes[:, NODE_PARENT] == -1)[0]
    assert len(roots) == 1 and roots[0] == 0
    assert nodes[0, NODE_CHILD_COUNT] == 2
    # all nodes reachable exactly once
    seen = walk(nodes, 0)
    assert len(seen) == len(set(seen)) == nodes.shape[0]
    # depths consistent
    for i in seen:
        p = nodes[i, NODE_PARENT]
        if p >= 0:
            assert nodes[i, NODE_DEPTH] == nodes[p, NODE_DEPTH] + 1
    # weights never increase opacity
    assert m.opacity.max() <= max(d0.opacity.max(), d1.opacity.max()) + 1e-6
    # far-side gaussians dropped: merged node count < sum of inputs
    assert nodes.shape[0] < d0.nodes.shape[0] + d1.nodes.shape[0] + 1


def test_merge_single_chunk_keeps_everything():
    d0 = chunk_dhier(np.zeros(3, np.float32), seed=3)
    m = merge.merge_hierarchies([d0], np.zeros((1, 3), np.float32))
    assert m.nodes.shape[0] == d0.nodes.shape[0] + 1
    np.testing.assert_allclose(np.sort(m.opacity[1:]), np.sort(d0.opacity),
                               atol=1e-6)


def test_make_chunks():
    from hlod_gaussians_tpu.data.scene import CameraInfo, SceneInfo

    rng = np.random.default_rng(0)
    cams = []
    for k in range(80):
        # cameras on a 2x1 grid of clusters 30 apart
        c = np.array([30.0 * (k % 2), 0.0, 0.0]) + rng.normal(0, 3, 3)
        R = np.eye(3)
        T = -R.T @ c  # world2cam translation for camera at c
        cams.append(CameraInfo(uid=k, R=R, T=T, fovx=1.0, fovy=1.0,
                               primx=0.5, primy=0.5, width=64, height=64,
                               image_path="", image_name=f"im{k}"))
    pts = rng.normal(0, 10, (500, 3)).astype(np.float32)
    pts[:, 0] += 15
    scene = SceneInfo(points=pts, colors=np.zeros_like(pts),
                      train_cameras=cams, test_cameras=[], extent=30.0,
                      center=np.zeros(3))
    chunks = chunking.make_chunks(scene, chunk_size=20.0, min_n_cams=5,
                                  min_points=10)
    assert len(chunks) >= 2
    total_cams = sum(len(c.cameras) for c in chunks)
    assert total_cams >= 80  # padding allows overlap
    for c in chunks:
        assert c.point_mask.sum() >= 10
