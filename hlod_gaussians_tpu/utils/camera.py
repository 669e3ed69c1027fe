"""Camera model and view/projection matrices.

Matches the reference conventions exactly:
  * world-to-view from (R, t) as in utils/graphics_utils.py getWorld2View2,
    then TRANSPOSED for row-vector use (scene/cameras.py:96-107),
  * principal-point-aware perspective projection as in
    utils/graphics_utils.py:51-78 (getProjectionMatrix),
  * full_proj_transform = world_view @ projection (row-vector order).

A `Camera` is a small pytree of static ints + jnp arrays so it can be passed
straight into jitted render/train steps.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def world_to_view(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """COLMAP-style (R, t) -> row-vector world-to-view 4x4.

    R is the camera-to-world rotation (as stored by the reference's readers,
    dataset_readers.py uses R = qvec2rotmat(...).T), t the world-to-camera
    translation. Returns the transpose of the column-vector W2C matrix, i.e.
    the matrix M with p_view = p_world @ M.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    return Rt.T.astype(np.float32).copy()


def projection_matrix(znear, zfar, fovx, fovy,
                      primx: float = 0.5, primy: float = 0.5) -> np.ndarray:
    """Row-vector perspective projection (reference getProjectionMatrix).

    primx/primy are the normalized principal point (0.5 = centered).
    """
    tan_half_y = math.tan(fovy / 2)
    tan_half_x = math.tan(fovx / 2)

    # asymmetric frustum from the normalized principal point
    # (graphics_utils.py:58-64)
    top = tan_half_y * znear
    bottom = (1 - primy) * 2 * -top
    top = primy * 2 * top
    right = tan_half_x * znear
    left = (1 - primx) * 2 * -right
    right = primx * 2 * right

    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    # column-vector form above; transpose for row-vector convention
    return P.T.copy()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single training/eval view (reference scene/cameras.py:31-107)."""

    # static (hashable) fields
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    # dynamic fields
    world_view: jnp.ndarray = None      # [4,4] row-vector W2V
    full_proj: jnp.ndarray = None       # [4,4] row-vector W2V @ proj
    campos: jnp.ndarray = None          # [3]
    tan_fovx: jnp.ndarray = None        # scalar
    tan_fovy: jnp.ndarray = None        # scalar
    image: Optional[jnp.ndarray] = None       # [3,H,W] ground truth, or None
    alpha_mask: Optional[jnp.ndarray] = None  # [1,H,W] or None
    invdepth: Optional[jnp.ndarray] = None    # [1,H,W] scaled inverse depth
    depth_mask: Optional[jnp.ndarray] = None  # [1,H,W]
    exposure_idx: Optional[jnp.ndarray] = None  # int32 scalar index

    @property
    def focal_x(self):
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self):
        return self.height / (2.0 * self.tan_fovy)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, znear: float = 0.01,
                zfar: float = 100.0, primx: float = 0.5, primy: float = 0.5,
                image=None, alpha_mask=None, invdepth=None, depth_mask=None,
                exposure_idx: int = 0) -> Camera:
    wv = world_to_view(R, t)
    proj = projection_matrix(znear, zfar, fovx, fovy, primx, primy)
    full = (wv @ proj).astype(np.float32)
    cam_center = np.linalg.inv(wv)[3, :3]
    return Camera(
        width=int(width), height=int(height),
        world_view=jnp.asarray(wv),
        full_proj=jnp.asarray(full),
        campos=jnp.asarray(cam_center.astype(np.float32)),
        tan_fovx=jnp.float32(math.tan(fovx / 2)),
        tan_fovy=jnp.float32(math.tan(fovy / 2)),
        image=None if image is None else jnp.asarray(image),
        alpha_mask=None if alpha_mask is None else jnp.asarray(alpha_mask),
        invdepth=None if invdepth is None else jnp.asarray(invdepth),
        depth_mask=None if depth_mask is None else jnp.asarray(depth_mask),
        exposure_idx=jnp.int32(exposure_idx),
    )
