"""Cross-chunk merge seam behavior (round-4 directive #8).

A camera straddling two chunks must see no discontinuity at the chunk
boundary. Two chunks share a padded overlap strip whose content was
"trained" independently (simulated by small per-chunk perturbations of the
same ground truth, which is exactly what independent per-chunk optimization
produces); the merger's linear opacity falloff around the equidistance
surface (getWeight, hierarchy_explicit_loader.cpp:22-52) cross-fades the
two copies. Compared against a hard cutover (falloff -> 0), the falloff
merge must remove the seam line: a strictly smaller worst adjacent-column
error jump across the boundary band.
"""

import numpy as np
import jax.numpy as jnp

from hlod_gaussians_tpu import render as render_mod
from hlod_gaussians_tpu.config import RasterizerConfig
from hlod_gaussians_tpu.data.dhier import DHier
from hlod_gaussians_tpu.hierarchy import build as hb, cut as hc
from hlod_gaussians_tpu.models.gaussians import NODE_CHILD_COUNT, NODE_PARENT
from hlod_gaussians_tpu.pipeline import merge
from hlod_gaussians_tpu.utils import camera as cam_mod

W, H = 128, 96
PAD = 0.2          # chunk overlap half-width (chunk_point_padding analogue)


def _scene(n=6000, seed=2):
    rng = np.random.default_rng(seed)
    pts = np.stack([
        rng.uniform(-1.0, 1.0, n),
        rng.uniform(-0.5, 0.5, n),
        rng.uniform(3.8, 4.6, n),
    ], axis=-1).astype(np.float32)
    # smooth structured colors: seam artifacts show against them
    cols = 0.5 + 0.4 * np.stack([
        np.sin(3.0 * pts[:, 0]), np.cos(2.0 * pts[:, 1] + pts[:, 2]),
        np.sin(1.5 * pts[:, 2]),
    ], axis=-1)
    scales = np.full((n, 3), 0.04, np.float32)
    quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.85, np.float32)
    C0 = 0.28209479177387814
    shs = ((cols - 0.5) / C0).astype(np.float32)[:, None, :]
    return pts, scales, quats, ops, shs


def _chunk_dhier(pts, scales, quats, ops, shs, mask, jitter_seed):
    """Independent 'training' of one chunk: the shared GT slightly
    perturbed, as separate optimizations of the same content would be."""
    rng = np.random.default_rng(jitter_seed)
    p = pts[mask] + rng.normal(0, 0.004, (mask.sum(), 3)).astype(np.float32)
    s = shs[mask] + rng.normal(0, 0.02, shs[mask].shape).astype(np.float32)
    h = hb.build_hierarchy(p, scales[mask], quats[mask], ops[mask], s)
    return DHier(sh_degree=0, pos=np.asarray(h.pos),
                 quat=np.asarray(h.quat),
                 log_scale=np.log(np.maximum(np.asarray(h.scale), 1e-12)),
                 opacity=np.asarray(h.opacity),
                 shs=np.asarray(h.sh), nodes=np.asarray(h.nodes))


def _render_merged(m: DHier, cam):
    mm = m.nodes.shape[0]
    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=1 << 16)
    out, n_sel = render_mod.render_lod(
        jnp.asarray(m.pos), jnp.asarray(np.exp(m.log_scale)),
        jnp.asarray(m.quat), jnp.asarray(np.clip(m.opacity, 0, 1)),
        jnp.asarray(m.shs), jnp.asarray(m.nodes), jnp.ones(mm, bool),
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, jnp.zeros(3), 1e-9,
        sh_degree=0, width=W, height=H, budget=1 << 14, cfg=cfg,
        k_max=2048, use_frustum=False)
    assert not bool(out.truncated)
    return np.clip(np.asarray(out.image), 0, 1), int(n_sel)


def _col_err(img, gt):
    return np.abs(img - gt).mean(axis=(0, 1))      # [W]


def test_merge_seam_continuity():
    pts, scales, quats, ops, shs = _scene()
    centers = np.array([[-0.5, 0.0, 4.2], [0.5, 0.0, 4.2]], np.float32)
    d0 = _chunk_dhier(pts, scales, quats, ops, shs, pts[:, 0] < PAD, 10)
    d1 = _chunk_dhier(pts, scales, quats, ops, shs, pts[:, 0] > -PAD, 11)

    merged = merge.merge_hierarchies([d0, d1], centers, falloff=0.05)
    hard = merge.merge_hierarchies([d0, d1], centers, falloff=1e-4)

    # structural invariants of the merged tree
    roots = np.where(merged.nodes[:, NODE_PARENT] == -1)[0]
    assert list(roots) == [0]
    leaves = jnp.asarray(merged.nodes[:, NODE_CHILD_COUNT] == 0)
    assert bool(hc.is_hierarchy_cut(
        jnp.asarray(merged.nodes), leaves,
        jnp.ones(merged.nodes.shape[0], bool)))

    # camera straddling the seam, looking down +z at x=0
    cam = cam_mod.make_camera(np.eye(3), np.zeros(3), 0.5, 0.4, W, H)

    cfg = RasterizerConfig(tile_w=16, tile_h=16, max_dup=1 << 16)
    gt = render_mod.render_arrays(
        jnp.asarray(pts), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(ops), jnp.asarray(shs), jnp.ones(pts.shape[0], bool),
        cam.world_view, cam.full_proj, cam.campos, cam.tan_fovx,
        cam.tan_fovy, jnp.zeros(3), sh_degree=0, width=W, height=H,
        cfg=cfg, k_max=2048)
    assert not bool(gt.truncated)
    gt_img = np.clip(np.asarray(gt.image), 0, 1)

    img_soft, n_soft = _render_merged(merged, cam)
    img_hard, n_hard = _render_merged(hard, cam)
    assert n_soft > 0 and n_hard > 0

    mse = ((img_soft - gt_img) ** 2).mean()
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 26.0, psnr

    # seam smoothness: worst adjacent-column error jump inside the
    # boundary band. The falloff cross-fade must beat the hard cutover's
    # seam line, and must not itself contain a sharp jump.
    e_soft = _col_err(img_soft, gt_img)
    e_hard = _col_err(img_hard, gt_img)
    band = slice(W // 2 - 16, W // 2 + 16)
    jump_soft = np.abs(np.diff(e_soft[band])).max()
    jump_hard = np.abs(np.diff(e_hard[band])).max()
    assert jump_soft < jump_hard, (jump_soft, jump_hard)
    # absolute bound: no column-to-column error step above 2x the scene's
    # out-of-band error level
    base = max(e_soft[:W // 4].mean(), e_soft[-W // 4:].mean())
    assert jump_soft < 2.0 * base + 5e-3, (jump_soft, base)
