from gansynth_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_train_inputs,
    shard_host_local_batch,
    initialize_multihost,
    jit_train_step_for_mesh,
)
