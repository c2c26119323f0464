"""Multi-chip parallelism: device mesh, shardings, parallel train step."""

from .mesh import (  # noqa: F401
    batch_shardings,
    make_mesh,
    make_parallel_train_step,
    make_waveglow_parallel_train_step,
    opt_state_shardings,
    param_shardings,
    shard_batch,
    shard_train_state,
    shard_waveglow_state,
    waveglow_param_shardings,
)
