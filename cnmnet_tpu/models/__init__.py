from cnmnet_tpu.models.depthnet import DepthNet
from cnmnet_tpu.models.refinenet import DepthRefineNet
from cnmnet_tpu.models.cnm import CNMModel, CNMOutputs

__all__ = ["DepthNet", "DepthRefineNet", "CNMModel", "CNMOutputs"]
