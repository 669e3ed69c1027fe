from hlod_gaussians_tpu.pipeline import chunking, merge  # noqa: F401
