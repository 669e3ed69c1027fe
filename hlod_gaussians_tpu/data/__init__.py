from hlod_gaussians_tpu.data import colmap, dhier, ply  # noqa: F401
