"""Configuration dataclasses.

Replaces the reference's reflection-based argparse groups
(`/root/reference/arguments/__init__.py:114-185`) and the module-level
constants of `/root/reference/train_post.py:63-109` with typed, immutable
dataclasses that can be hashed into jit static args.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model / scene loading parameters (reference arguments/__init__.py:114-147)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    alpha_masks: str = ""
    depths: str = ""
    resolution: int = -1
    white_background: bool = False
    train_test_exp: bool = False
    eval: bool = False
    skip_scale_big_gauss: bool = False
    hierarchy: str = ""
    pretrained: str = ""
    skybox_num: int = 0
    scaffold_file: str = ""
    # NOTE: the reference's bounds_file (a center.txt/extent.txt dir fed to
    # create_from_pcd) has no field here — chunk bounds flow through
    # pipeline/chunking.Chunk directly.
    skybox_locked: bool = False
    cap_max: int = -1  # MCMC capacity target (-1 = keep PostConfig.max_cap)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Render pipeline switches (reference arguments/__init__.py:149-154)."""

    antialiasing: bool = False  # alt-rasterizer EWA AA (forward.cu:226-272 in alt-rasterizer)
    debug: bool = False


@dataclasses.dataclass(frozen=True)
class OptimizationConfig:
    """Training hyperparameters (reference arguments/__init__.py:156-185)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00002
    position_lr_final: float = 0.0000002
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    exposure_lr_init: float = 0.001
    exposure_lr_final: float = 0.0001
    exposure_lr_delay_steps: int = 5000
    exposure_lr_delay_mult: float = 0.001
    lambda_dssim: float = 0.2
    densification_interval: int = 300
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.015
    depth_l1_weight_init: float = 1.0
    depth_l1_weight_final: float = 0.01
    # NOTE deliberately absent vs the reference's OptimizationParams:
    # percent_dense (its densify criterion is commented out in the fork,
    # gaussian_model.py:1357,1411 — the live criterion is grad*radii*op^0.2)
    # and the MCMC trio noise_lr/scale_reg/opacity_reg, which live here as
    # PostConfig.mcmc_noise_lr / lambda_scaling / lambda_opacity.


@dataclasses.dataclass(frozen=True)
class RasterizerConfig:
    """Static shape budgets for the fixed-shape TPU rasterizer.

    The CUDA reference sizes every buffer dynamically per frame
    (rasterizer_impl.cu); on TPU all shapes must be static, so the binning
    and blending pipeline runs at these capacities with validity masks.
    """

    # Blend backend: "pallas" = production TPU kernels (ops/rasterize_pallas),
    # "xla" = lax.scan reference (ops/rasterize_xla).
    backend: str = "xla"
    # Pixel tile shape. The pallas backend requires tile_h * tile_w to be a
    # multiple of 128 (the VPU lane count); 16x16 = 256-pixel tiles halve the
    # sequential program count and dup-entry totals versus 128-pixel tiles.
    tile_h: int = 8
    tile_w: int = 128
    # Alpha-aware tight tile coverage (pallas backend only): bin on the
    # alpha>=alpha_min iso-ellipse AABB + circumscribed circle instead of the
    # reference's 3-sigma circle rects. Identical images (every dropped
    # entry fails the in-kernel alpha_min skip), ~2x fewer entries.
    tight_binning: bool = True
    # Capacity of the duplicated (gaussian, tile) key list. Overflow is
    # detected and reported; increase for bigger scenes / resolutions.
    max_dup: int = 1 << 19
    # Early-exit transmittance threshold (forward.cu:563).
    t_eps: float = 1e-4
    # Minimum alpha for a contribution (forward.cu:560).
    alpha_min: float = 1.0 / 255.0
    # Near-plane cull distance (forward.cu:322).
    near: float = 0.2
    # Dilation added to the 2D covariance diagonal (forward.cu:361-364).
    dilation: float = 0.3
    # Cull Gaussians whose max scale exceeds this (forward.cu:351, biglimit).
    big_limit: float = float("inf")
    # Tiles per Pallas grid program: batches the ~2-4us fixed per-program
    # cost; keep num_tiles/tpb around a few hundred programs.
    tpb: int = 4
    # Inference-only rendering: binning skips the gradient-reduction
    # bookkeeping (a cap-sized sort, ~5 ms at 1M nodes). Differentiating
    # such a render raises. The render_lod* entry points force this on.
    inference: bool = False


@dataclasses.dataclass(frozen=True)
class PostConfig:
    """Hierarchy post-optimization settings (reference train_post.py:63-109)."""

    densify_interval: int = 5000
    lr_multiplier: float = 1.0
    max_cap: int = 50_000_000
    mcmc_densification: bool = True
    mcmc_noise_lr: float = 0.0
    lambda_scaling: float = 0.0
    lambda_opacity: float = 0.01
    # NOTE deliberately absent vs the fork's train_post constants:
    # Gaussian_Interpolation / Gradient_Propagation / Propagation_Strength /
    # lambda_hierarchy exist there as config only — every line that would
    # consume them is commented out (train_post.py:563,826-856).
    # exact subtree bounding spheres for the SPT frustum culls; False = the
    # node's own 3*max_scale (the reference DEFAULT, train_post.py:82 — but
    # its culls may then clip protruding SPT members; we default to safe)
    use_bounding_spheres: bool = True
    use_occlusion_culling: bool = False
    use_frustum_culling: bool = True
    use_mip_respawn: bool = False
    spt_root_volume: float = 100.0
    spt_target_granularity: float = 0.00228
    min_spt_size: int = 256
    cache_spts: bool = True
    reuse_spt_tolerance: float = 0.9
    max_gaussian_budget: int = 100_000_000
    distance_multiplier_until_budget: float = 1.5
    max_sh_degree: int = 1
    dead_opacity: float = 0.005     # relocate_gs threshold (gaussian_model.py:1594)
    grow_fraction: float = 0.05     # add_new_gs growth per round (gaussian_model.py:1703)


def save_config(path: str, **configs) -> None:
    """Persist config dataclasses to JSON (the reference's `cfg_args` dump,
    train_single.py:194-206): {"ModelConfig": {...}, ...}."""
    import json
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    out = {type(c).__name__: dataclasses.asdict(c) for c in configs.values()}
    with open(path, "w") as f:
        json.dump(out, f, indent=2, default=float)


def load_config(path: str, overrides: Optional[dict] = None) -> dict:
    """Load saved configs, re-applying CLI-style overrides on top (the
    reference's get_combined_args merge, arguments/__init__.py:187-207).
    Returns {class_name: instance}."""
    import json

    classes = {c.__name__: c for c in (ModelConfig, PipelineConfig,
                                       OptimizationConfig, RasterizerConfig,
                                       PostConfig, MeshConfig)}
    with open(path) as f:
        raw = json.load(f)
    out = {}
    for name, kv in raw.items():
        cls = classes.get(name)
        if cls is None:
            continue
        if overrides and name in overrides:
            kv = {**kv, **overrides[name]}
        fields = {f.name for f in dataclasses.fields(cls)}
        out[name] = cls(**{k: v for k, v in kv.items() if k in fields})
    return out


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for multi-chip training.

    The reference scales out via SLURM job-per-chunk
    (scripts/full_train.py:79-236); here chunks map onto a `data` mesh axis of
    a single jax program and pixels/tiles shard over the `tile` axis.
    `parallel.data_parallel.make_mesh` consumes this (axis names included);
    `parallel.tile_parallel` takes `tile_axis` as its band axis.
    """

    data_axis: str = "data"
    tile_axis: str = "tile"
    data: int = 1
    tile: int = 1

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.data, self.tile)
