from cnmnet_tpu.parallel.mesh import make_mesh, batch_sharding, replicated
from cnmnet_tpu.parallel.sharding import (
    shard_batch,
    constrain_spatial,
    halo_exchange_rows,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "constrain_spatial",
    "halo_exchange_rows",
]
