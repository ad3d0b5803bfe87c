"""Device-mesh / sharding utilities for data-parallel training."""

from unet_implementations_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate,
)
