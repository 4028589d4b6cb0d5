from gddim_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch,
    batch_sharding,
)
