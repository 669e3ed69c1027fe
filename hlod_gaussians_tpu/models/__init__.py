from hlod_gaussians_tpu.models.gaussians import (  # noqa: F401
    GaussianState,
    activate,
    create_from_points,
    make_skybox,
)
