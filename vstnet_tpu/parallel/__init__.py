from vstnet_tpu.parallel.mesh import make_mesh  # noqa: F401
from vstnet_tpu.parallel.sharding import (  # noqa: F401
    replicated,
    batch_sharded,
    spatial_sharded,
    shard_batch,
    parallel_stylize,
    parallel_stylize_factored,
    parallel_stylize_fused,
    parallel_stylize_masked_fused,
    make_parallel_flat_step,
    make_parallel_train_step,
)
