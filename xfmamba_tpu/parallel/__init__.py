from xfmamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    make_parallel_train_step,
    make_parallel_infer,
)
