from hlod_gaussians_tpu.train.flat import (  # noqa: F401
    FlatTrainState,
    init_flat_train,
    train_step,
    densify_step,
    reset_opacity,
)
