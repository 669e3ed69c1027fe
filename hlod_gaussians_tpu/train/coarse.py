"""Coarse scaffold training (reference train_coarse.py:29-175).

A thin specialization of the flat trainer: SH degree 1, positions frozen
(xyz LR = 0), low opacity init, random background per step, no
densification, per-step big-Gaussian shrink. Produces the global scaffold
that chunk training conditions on (scaffold_file)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.config import OptimizationConfig, RasterizerConfig
from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import flat


def coarse_opt_config(base: OptimizationConfig = OptimizationConfig()
                      ) -> OptimizationConfig:
    """Coarse hyperparameters (train_coarse.py:33-36,60-62): xyz frozen."""
    return dataclasses.replace(
        base,
        position_lr_init=0.0,
        position_lr_final=0.0,
        densify_until_iter=0,
    )


def init_coarse(points: np.ndarray, colors: np.ndarray, capacity: int,
                scene_radius: float, skybox_num: int = 100_000,
                n_exposures: int = 1) -> flat.FlatTrainState:
    """Scaffold init: SH degree 1, opacity logit -3 ~ sigmoid 0.047
    (train_coarse.py / create_from_pcd with scaffold defaults)."""
    state = gm.create_from_points(
        points, colors, capacity=capacity, sh_degree=1,
        n_exposures=n_exposures, scene_radius=scene_radius,
        skybox_num=skybox_num, opacity_init=float(jax.nn.sigmoid(-3.0)))
    return flat.init_flat_train(state)


def coarse_step(ts: flat.FlatTrainState, cam_arrays, gt_image, key,
                scene_extent: float, *,
                opt: OptimizationConfig, cfg: RasterizerConfig,
                width: int, height: int, k_max: int = 1024,
                ) -> Tuple[flat.FlatTrainState, flat.StepAux]:
    """One coarse step with a random background color
    (train_coarse.py:70)."""
    world_view, full_proj, campos, tan_fovx, tan_fovy = cam_arrays
    bg = jax.random.uniform(key, (3,))
    return flat.train_step(
        ts, world_view, full_proj, campos, tan_fovx, tan_fovy, gt_image, bg,
        exposure_idx=jnp.int32(0), scene_extent=scene_extent,
        opt=opt, cfg=cfg, width=width, height=height, k_max=k_max,
        sh_degree=1, use_exposure=False, skybox_locked=False,
        scale_big_gauss=True, big_gauss_frac=0.1)
