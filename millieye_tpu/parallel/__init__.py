from millieye_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    param_sharding,
    shard_batch,
    shard_train_state,
    sharded_step,
)
