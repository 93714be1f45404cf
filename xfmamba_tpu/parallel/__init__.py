from xfmamba_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    make_parallel_train_step,
    make_parallel_infer,
)
from xfmamba_tpu.parallel.distributed import (
    ensure_initialized,
    is_primary,
    make_global_mesh,
    process_batch_slice,
    host_local_batch_to_global,
)
