"""Device-mesh / sharding utilities: data-parallel and spatial partitioning."""

from unet_implementations_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
from unet_implementations_tpu.parallel.spatial import (  # noqa: F401
    create_mesh_dp_sp,
    shard_batch_spatial,
    spatial_forward_jit,
    spatial_sharding,
    spatial_train_step_jit,
)
