from cnmnet_tpu.ops.cost_volume import (
    idepth_hypotheses,
    plane_sweep_cost_volume,
    cost_volume_from_cameras,
)
from cnmnet_tpu.ops.normals import depth_to_normal, box_filter
from cnmnet_tpu.ops.planes import (
    plane_average_normals,
    normal_by_planes,
    plane_consistency_loss,
)

__all__ = [
    "idepth_hypotheses",
    "plane_sweep_cost_volume",
    "cost_volume_from_cameras",
    "depth_to_normal",
    "box_filter",
    "plane_average_normals",
    "normal_by_planes",
    "plane_consistency_loss",
]
