from gddim_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch,
    batch_sharding,
)
from gddim_tpu.parallel.multihost import (
    allgather_metrics,
    barrier,
    initialize_distributed,
    is_coordinator,
)
