from hlod_gaussians_tpu.preprocess import depth_scale, reorient  # noqa: F401
