from cnmnet_tpu.kernels.dispatch import (
    get_backend,
    set_backend,
    cost_volume,
    depth_to_normal,
)

__all__ = ["get_backend", "set_backend", "cost_volume", "depth_to_normal"]
