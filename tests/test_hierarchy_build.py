"""Hierarchy build tests: tree invariants + merge math parity against a
direct recursive numpy re-statement of the reference C++ creator
(PointbasedKdTreeGenerator.cpp / ClusterMerger.cpp)."""

import numpy as np
import pytest

from hlod_gaussians_tpu.hierarchy import build as hb
from hlod_gaussians_tpu.models.gaussians import (
    NODE_CHILD_COUNT, NODE_DEPTH, NODE_FIRST_CHILD, NODE_NEXT_SIBLING,
    NODE_PARENT)
from hlod_gaussians_tpu.ops import quaternion
import jax.numpy as jnp


def random_gaussians(n, seed=0, sh_k=1):
    rng = np.random.default_rng(seed)
    means = rng.normal(size=(n, 3)).astype(np.float32) * 2
    scales = np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.3 - 2)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    ops = rng.uniform(0.2, 0.9, size=(n,)).astype(np.float32)
    shs = rng.normal(size=(n, sh_k, 3)).astype(np.float32)
    return means, scales, q, ops, shs


def check_tree_invariants(h: hb.Hierarchy, n_leaves):
    """The model's sanity_check_hierarchy semantics
    (reference scene/gaussian_model.py:637-675)."""
    nodes = h.nodes
    m = nodes.shape[0]
    assert m == 2 * n_leaves - 1

    roots = np.where(nodes[:, NODE_PARENT] == -1)[0]
    assert len(roots) == 1

    # child back-pointers and reachability
    seen = np.zeros(m, bool)
    stack = [roots[0]]
    while stack:
        i = stack.pop()
        assert not seen[i]
        seen[i] = True
        cc = nodes[i, NODE_CHILD_COUNT]
        assert cc in (0, 2)
        if cc == 2:
            c0 = nodes[i, NODE_FIRST_CHILD]
            c1 = nodes[c0, NODE_NEXT_SIBLING]
            for c in (c0, c1):
                assert nodes[c, NODE_PARENT] == i
                assert nodes[c, NODE_DEPTH] >= nodes[i, NODE_DEPTH] + 1
                stack.append(c)
    assert seen.all()

    # every original point appears at exactly one leaf
    leaves = nodes[:, NODE_CHILD_COUNT] == 0
    lp = h.leaf_point[leaves]
    assert (lp >= 0).all()
    assert np.sort(lp).tolist() == list(range(n_leaves))
    assert (h.leaf_point[~leaves] == -1).all()


@pytest.mark.parametrize("n", [2, 3, 5, 16, 33, 100])
def test_tree_invariants(n):
    args = random_gaussians(n)
    h = hb.build_hierarchy(*args)
    check_tree_invariants(h, n)


def test_leaves_keep_input_gaussians():
    means, scales, q, ops, shs = random_gaussians(17)
    h = hb.build_hierarchy(means, scales, q, ops, shs)
    leaves = h.nodes[:, NODE_CHILD_COUNT] == 0
    lp = h.leaf_point[leaves]
    np.testing.assert_allclose(h.pos[leaves], means[lp], atol=1e-6)
    np.testing.assert_allclose(h.opacity[leaves], ops[lp], atol=1e-6)
    # scale/quat may be axis-permuted by rotation alignment: compare the
    # reconstructed covariance instead (permutation-invariant)
    from hlod_gaussians_tpu.ops import gaussian_math
    cov_out = np.asarray(gaussian_math.compute_cov3d(
        jnp.asarray(h.scale[leaves]), jnp.asarray(h.quat[leaves])))
    cov_in = np.asarray(gaussian_math.compute_cov3d(
        jnp.asarray(scales[lp]), jnp.asarray(q[lp])))
    np.testing.assert_allclose(cov_out, cov_in, atol=1e-4)


def merge_pair_reference(p, s, q, o, sh):
    """Direct numpy ClusterMerger.cpp:50-146 for two Gaussians."""
    def surface(s):
        return s[0] * s[1] + s[0] * s[2] + s[1] * s[2]

    def cov(s, q):
        w, x, y, z = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])
        return R @ np.diag(s ** 2) @ R.T

    w = np.array([o[i] * surface(s[i]) for i in range(2)])
    wsum = w.sum()
    a = w / wsum
    mpos = a[0] * p[0] + a[1] * p[1]
    msh = a[0] * sh[0] + a[1] * sh[1]
    mcov = np.zeros((3, 3))
    for i in range(2):
        d = (p[i] - mpos)[:, None]
        mcov += a[i] * (cov(s[i], q[i]) + d @ d.T)
    evals, evecs = np.linalg.eigh(mcov)
    mscale = np.sqrt(np.abs(evals))
    mop = wsum / surface(mscale)
    return mpos, mscale, mop, msh, mcov


def test_merge_math_parity():
    """Two-leaf hierarchy == direct pairwise reference merge."""
    means, scales, q, ops, shs = random_gaussians(2, seed=3)
    h = hb.build_hierarchy(means, scales, q, ops, shs)
    root = np.where(h.nodes[:, NODE_PARENT] == -1)[0][0]
    lp = h.leaf_point
    leaf_order = [np.where(lp == i)[0][0] for i in range(2)]

    mpos, mscale, mop, msh, mcov = merge_pair_reference(
        means, scales, q, ops, shs)
    np.testing.assert_allclose(h.pos[root], mpos, atol=1e-5)
    np.testing.assert_allclose(np.sort(h.scale[root]), np.sort(mscale),
                               rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(h.opacity[root], mop, rtol=1e-3)
    np.testing.assert_allclose(h.sh[root], msh, atol=1e-5)

    # merged covariance is reproduced by (scale, quat)
    from hlod_gaussians_tpu.ops import gaussian_math
    cov_out = np.asarray(gaussian_math.unpack_cov3d(gaussian_math.compute_cov3d(
        jnp.asarray(h.scale[root]), jnp.asarray(h.quat[root]))))
    np.testing.assert_allclose(cov_out, mcov, atol=1e-4)


def test_merged_covariance_moment_match():
    """For any interior node: cov(merged) ~= sum_i a_i (cov_i + d_i d_i^T)
    over its two children — the covariance-preserving property."""
    means, scales, q, ops, shs = random_gaussians(16, seed=5)
    h = hb.build_hierarchy(means, scales, q, ops, shs)
    from hlod_gaussians_tpu.ops import gaussian_math

    def node_cov(i):
        return np.asarray(gaussian_math.unpack_cov3d(
            gaussian_math.compute_cov3d(jnp.asarray(h.scale[i]),
                                        jnp.asarray(h.quat[i]))))

    interior = np.where(h.nodes[:, NODE_CHILD_COUNT] == 2)[0]
    for i in interior:
        c0 = h.nodes[i, NODE_FIRST_CHILD]
        c1 = h.nodes[c0, NODE_NEXT_SIBLING]
        w = np.array([h.opacity[c] * hb.ellipse_surface(h.scale[c])
                      for c in (c0, c1)])
        a = w / w.sum()
        expect = np.zeros((3, 3))
        mpos = a[0] * h.pos[c0] + a[1] * h.pos[c1]
        np.testing.assert_allclose(h.pos[i], mpos, atol=1e-5)
        for aa, c in zip(a, (c0, c1)):
            d = (h.pos[c] - mpos)[:, None]
            expect += aa * (node_cov(c) + d @ d.T)
        np.testing.assert_allclose(node_cov(i), expect, atol=1e-4)


def test_rotation_alignment_improves_frobenius():
    """Aligned child rotations score >= unaligned against the parent."""
    rng = np.random.default_rng(7)
    pq = rng.normal(size=(32, 4)).astype(np.float32)
    cq = rng.normal(size=(32, 4)).astype(np.float32)
    cs = np.exp(rng.normal(size=(32, 3)).astype(np.float32))

    nq, ns = hb.align_rotations_to(jnp.asarray(pq), jnp.asarray(cq),
                                   jnp.asarray(cs))
    rp = np.asarray(quaternion.to_matrix(quaternion.normalize(jnp.asarray(pq))))
    rc = np.asarray(quaternion.to_matrix(quaternion.normalize(jnp.asarray(cq))))
    rn = np.asarray(quaternion.to_matrix(quaternion.normalize(nq)))
    s_before = np.sum(rc * rp, axis=(-1, -2))
    s_after = np.sum(rn * rp, axis=(-1, -2))
    assert (s_after >= s_before - 1e-5).all()
    # covariance is unchanged by the alignment (it only permutes axes)
    from hlod_gaussians_tpu.ops import gaussian_math
    c_before = np.asarray(gaussian_math.compute_cov3d(jnp.asarray(cs),
                                                      jnp.asarray(cq)))
    c_after = np.asarray(gaussian_math.compute_cov3d(np.asarray(ns), nq))
    np.testing.assert_allclose(c_after, c_before, atol=1e-4)


def test_kd_split_is_median_partition():
    """Root split separates points by the median along the longest axis."""
    rng = np.random.default_rng(11)
    means = rng.normal(size=(64, 3)).astype(np.float32)
    means[:, 0] *= 10  # x is clearly the longest axis
    scales = np.full((64, 3), 0.01, np.float32)
    q = np.tile(np.array([1, 0, 0, 0], np.float32), (64, 1))
    ops = np.full((64,), 0.5, np.float32)
    shs = np.zeros((64, 1, 3), np.float32)
    h = hb.build_hierarchy(means, scales, q, ops, shs)

    root = np.where(h.nodes[:, NODE_PARENT] == -1)[0][0]
    c0 = h.nodes[root, NODE_FIRST_CHILD]
    c1 = h.nodes[c0, NODE_NEXT_SIBLING]

    def leaves_under(i):
        out, stack = [], [i]
        while stack:
            j = stack.pop()
            if h.nodes[j, NODE_CHILD_COUNT] == 0:
                out.append(h.leaf_point[j])
            else:
                a = h.nodes[j, NODE_FIRST_CHILD]
                stack += [a, h.nodes[a, NODE_NEXT_SIBLING]]
        return np.asarray(out)

    left, right = leaves_under(c0), leaves_under(c1)
    assert len(left) == 32 and len(right) == 32
    assert means[left, 0].max() <= means[right, 0].min() + 1e-6


def test_sym_eigh3_matches_lapack():
    """Analytic 3x3 eigensolver == jnp.linalg.eigh on random PSD matrices."""
    rng = np.random.default_rng(13)
    b = rng.normal(size=(256, 3, 3)).astype(np.float64)
    a = b @ np.transpose(b, (0, 2, 1)) + 1e-8 * np.eye(3)
    ev_ref, vec_ref = np.linalg.eigh(a)
    ev, vec = hb.sym_eigh3(jnp.asarray(a, jnp.float32))
    ev, vec = np.asarray(ev), np.asarray(vec)
    np.testing.assert_allclose(ev, ev_ref, rtol=2e-3, atol=2e-4)
    # eigenvectors equal up to sign; check A v = lambda v instead
    for i in range(0, 256, 17):
        for k in range(3):
            r = a[i] @ vec[i][:, k] - ev[i][k] * vec[i][:, k]
            assert np.linalg.norm(r) < 1e-2 * max(1.0, abs(ev[i][k])), (i, k)
    # orthonormal right-handed frames
    eye = np.einsum("nij,nik->njk", vec, vec)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (256, 1, 1)),
                               atol=2e-3)
    dets = np.linalg.det(vec)
    np.testing.assert_allclose(dets, 1.0, atol=2e-3)


def test_sym_eigh3_degenerate():
    """Repeated eigenvalues (spheres, cylinders) stay finite + orthonormal."""
    mats = np.stack([
        np.eye(3),
        np.diag([2.0, 2.0, 5.0]),
        np.diag([3.0, 1.0, 1.0]),
        np.full((3, 3), 1.0) + np.eye(3),
    ]).astype(np.float32)
    ev, vec = hb.sym_eigh3(jnp.asarray(mats))
    ev, vec = np.asarray(ev), np.asarray(vec)
    assert np.isfinite(ev).all() and np.isfinite(vec).all()
    for i in range(len(mats)):
        eye = vec[i].T @ vec[i]
        np.testing.assert_allclose(eye, np.eye(3), atol=1e-3)
        np.testing.assert_allclose(np.sort(ev[i]),
                                   np.sort(np.linalg.eigvalsh(mats[i])),
                                   atol=1e-3)


def test_avg_merger_variant():
    """AvgMerger.cpp semantics: parent = child mean (scale summed)."""
    rng = np.random.default_rng(4)
    n = 8
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    scales = np.full((n, 3), 0.1, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = rng.uniform(0.3, 0.8, n).astype(np.float32)
    shs = rng.normal(size=(n, 1, 3)).astype(np.float32)
    h = hb.build_hierarchy(pts, scales, quats, ops, shs, merger="avg")
    nodes = h.nodes
    # parent position = mean of its two children; scale = sum
    for i in range(nodes.shape[0]):
        if nodes[i, 2] == 2:   # child_count
            c0 = nodes[i, 3]
            c1 = nodes[c0, 4]
            np.testing.assert_allclose(
                h.pos[i], 0.5 * (h.pos[c0] + h.pos[c1]), atol=1e-5)
            np.testing.assert_allclose(
                h.scale[i], h.scale[c0] + h.scale[c1], atol=1e-5)


def test_flat_generator():
    """FlatGenerator.cpp: one root, all inputs as direct children."""
    from hlod_gaussians_tpu.hierarchy.cut import sanity_check_hierarchy

    rng = np.random.default_rng(5)
    n = 10
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    h = hb.build_flat(pts, np.full((n, 3), 0.1, np.float32),
                      np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1)),
                      rng.uniform(0.2, 0.9, n).astype(np.float32),
                      rng.normal(size=(n, 1, 3)).astype(np.float32))
    assert h.nodes.shape[0] == n + 1
    assert h.nodes[0, 2] == n
    sanity_check_hierarchy(h.nodes, np.ones(n + 1, bool))


def test_heap_depth_exact_above_2_24():
    """f32 log2 misclassifies heap indices just below level boundaries
    above 2^24; the threshold-count formula must be exact there."""
    import jax.numpy as jnp
    idxs = np.array([0, 1, 2, 3, 6, 7,
                     (1 << 24) - 2, (1 << 24) - 1, (1 << 24),
                     (1 << 25) - 4, (1 << 25) - 3, (1 << 25) - 2,
                     (1 << 25) - 1, (1 << 30) - 2], np.int32)
    want = np.floor(np.log2(idxs.astype(np.float64) + 1)).astype(np.int32)
    got = np.asarray(hb.heap_depth(jnp.asarray(idxs)))
    np.testing.assert_array_equal(got, want)
    # the f32 formulation is indeed wrong at these indices (sanity)
    f32 = np.floor(np.log2(idxs.astype(np.float32) + 1.0)).astype(np.int32)
    assert (f32 != want).any()


def test_bucketed_build_identical_to_unpadded():
    """build_hierarchy pads non-power-of-two leaf counts to a shape bucket
    (one compile per bucket instead of per leaf count); the padded rows
    must be provably inert — tree and moments identical to driving
    build_hierarchy_padded at the exact size."""
    import jax.numpy as jnp

    rng = np.random.default_rng(9)
    n = 1000                        # pads to 1024 internally
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    sc = np.exp(rng.normal(size=(n, 3)) * 0.3 - 2.5).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    op = rng.uniform(0.1, 0.9, n).astype(np.float32)
    sh = rng.normal(size=(n, 1, 3)).astype(np.float32)

    h_pad = hb.build_hierarchy(pts, sc, q, op, sh)
    ph = hb.build_hierarchy_padded(
        jnp.asarray(pts), jnp.asarray(sc), jnp.asarray(q),
        jnp.asarray(op), jnp.asarray(sh), n_levels=10)
    h_dir = hb.compact_hierarchy(ph)
    np.testing.assert_array_equal(h_pad.nodes, h_dir.nodes)
    np.testing.assert_array_equal(h_pad.leaf_point, h_dir.leaf_point)
    np.testing.assert_allclose(h_pad.pos, h_dir.pos)
    np.testing.assert_allclose(h_pad.scale, h_dir.scale)
    np.testing.assert_allclose(h_pad.opacity, h_dir.opacity)
