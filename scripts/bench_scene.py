"""The benchmark scene: 100k Gaussians with trained-scene statistics.

Round 1's bench scene initialized scales from kNN spacing of a random
cloud, which at 1080p yields ~25M dup entries — and max_dup=2M silently
truncated ~90% of them (the r01 numbers measured a corrupted workload).
This scene instead matches the screen-space statistics of a converged flat
3DGS chunk: log-normal scales (median projected radius ~4 px), mixed
opacities, uniform depth spread. The bench asserts no truncation.
"""

import numpy as np


def make_bench_scene(n_pts=100_000, seed=0):
    """Returns raw parameter arrays [n] for the bench step."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_pts, 3)).astype(np.float32) * 2.0
    pts[:, 2] += 8.0                       # depth ~ N(8, 2), camera at origin
    # log-normal scales, median 0.03 world units -> ~4-6 px radius at the
    # bench focal length; a converged chunk's distribution (most Gaussians
    # small, a long tail of big ones)
    log_scale = (rng.normal(size=(n_pts, 3)).astype(np.float32) * 0.45
                 + np.log(0.025))
    quat = rng.normal(size=(n_pts, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    # opacity logits: mixture of faint and solid (post-densification look)
    op = rng.uniform(0.05, 0.95, n_pts).astype(np.float32)
    op_logit = np.log(op / (1 - op)).astype(np.float32)[:, None]
    f_dc = rng.normal(size=(n_pts, 1, 3)).astype(np.float32) * 0.3
    f_rest = rng.normal(size=(n_pts, 15, 3)).astype(np.float32) * 0.05
    return dict(xyz=pts, log_scale=log_scale, quat=quat,
                opacity_logit=op_logit, f_dc=f_dc, f_rest=f_rest)
