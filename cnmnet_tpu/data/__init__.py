from cnmnet_tpu.data.cameras import load_cam_text, write_cam_text, make_cam_array
from cnmnet_tpu.data.synthetic import SyntheticScenes
from cnmnet_tpu.data.scannet import ScanNetDataset
from cnmnet_tpu.data.seven_scenes import SevenScenes
from cnmnet_tpu.data.pipeline import PrefetchLoader, collate

__all__ = [
    "load_cam_text",
    "write_cam_text",
    "make_cam_array",
    "SyntheticScenes",
    "ScanNetDataset",
    "SevenScenes",
    "PrefetchLoader",
    "collate",
]
