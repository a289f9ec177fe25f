from .semantic_kitti import SemanticKittiIndex, read_calib, dynamic_baseline
from .labels import LEARNING_MAP, LEARNING_MAP_INV, remap_lut, inv_map
from .pipeline import SemanticKittiPipeline, PipelineConfig
from .loader import BatchLoader

__all__ = [
    "SemanticKittiIndex",
    "read_calib",
    "dynamic_baseline",
    "LEARNING_MAP",
    "LEARNING_MAP_INV",
    "remap_lut",
    "inv_map",
    "SemanticKittiPipeline",
    "PipelineConfig",
    "BatchLoader",
]
