from gansynth_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    make_multislice_mesh,
    batch_sharding,
    chunk_sharding,
    replicated_sharding,
    replicate_on_mesh,
    shard_train_inputs,
    shard_host_local_batch,
    shard_host_local_chunk,
    initialize_multihost,
    jit_train_step_for_mesh,
    jit_superstep_for_mesh,
)
