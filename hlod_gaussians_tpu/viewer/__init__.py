from hlod_gaussians_tpu.viewer.server import ViewerServer  # noqa: F401
