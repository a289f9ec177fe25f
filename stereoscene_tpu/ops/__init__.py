from .voxel_pool import voxel_pool_scatter, voxel_pool_sorted, lift_splat
from .gwc import groupwise_correlation_volume, warp_disparity_to_depth
from .bri_attention import confidence_attention
from .resize import resize_bilinear, resize_trilinear

__all__ = [
    "voxel_pool_scatter",
    "voxel_pool_sorted",
    "lift_splat",
    "groupwise_correlation_volume",
    "warp_disparity_to_depth",
    "confidence_attention",
    "resize_bilinear",
    "resize_trilinear",
]
