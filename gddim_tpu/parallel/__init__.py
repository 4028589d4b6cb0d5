from gddim_tpu.parallel.mesh import (
    make_mesh,
    make_mesh_2d,
    make_mesh_3d,
    fsdp_shard_params,
    tp_shard_params,
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
