from hlod_gaussians_tpu.parallel.data_parallel import (  # noqa: F401
    make_mesh,
    shard_train_state,
    dp_train_step,
)
