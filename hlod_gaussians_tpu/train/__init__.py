from hlod_gaussians_tpu.train.flat import (  # noqa: F401
    FlatTrainState,
    init_flat_train,
    train_step,
    densify_step,
    reset_opacity,
)
from hlod_gaussians_tpu.train import coarse, offload, post  # noqa: F401
