"""hlod_gaussians_tpu — a TPU-native hierarchical-LOD 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
FelixWindisch/hierarchical-LOD-gaussians (itself a fork of
graphdeco-inria/hierarchical-3d-gaussians, "A Hierarchical 3D Gaussian
Representation for Real-Time Rendering of Very Large Datasets", ToG 2024):

* differentiable tile-binned Gaussian rasterization with hierarchy (parent/child)
  interpolation — Pallas blend kernels + XLA preprocess (reference:
  submodules/hierarchy-rasterizer/cuda_rasterizer/{forward,backward}.cu)
* merge-hierarchy construction (kd-split + covariance-preserving cluster merge +
  rotation alignment) as a batched XLA pipeline (reference:
  submodules/gaussianhierarchy/{PointbasedKdTreeGenerator,ClusterMerger,rotation_aligner}.cpp)
* granularity-driven LOD cuts, SPT caches and out-of-core training
  (reference: scene/gaussian_model.py, train_post.py, runtime_switching.cu)
* MCMC densification on the hierarchy (reference: scene/gaussian_model.py:1588-1767)
* chunked large-scene training scaled via jax.sharding Mesh instead of SLURM
  (reference: scripts/full_train.py)

Everything is fixed-shape, capacity-padded and mask-driven so the whole training
step stays inside one jitted XLA program.
"""

__version__ = "0.1.0"

import jax as _jax

# The hot paths of this framework are VPU work (per-pixel blending) and tiny
# 3x3/4x4 matrix algebra; there are no large matmuls to feed the MXU in the
# core render/train step. TPU's default bf16 matmul precision breaks the
# covariance/rotation math (quaternion->matrix->quaternion roundtrips drift by
# ~5e-3), so default to full f32 matmuls. Pallas kernels and any future
# MXU-heavy ops opt into bf16 explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from hlod_gaussians_tpu import config  # noqa: F401,E402
