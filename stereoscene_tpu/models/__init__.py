"""Model zoo. Submodules import lazily enough in practice; these re-exports
cover the active architecture plus the alternate families."""

from .detector import BEVDepthOccupancy, DetectorConfig
from .efficientnet import CustomEfficientNet
from .second_fpn import SECONDFPN, SECONDFPN3D
from .resnet3d import CustomResNet3D
from .occhead import OccHead
from .lss import ViewTransformerLiftSplatShootVoxel

__all__ = [
    "BEVDepthOccupancy",
    "DetectorConfig",
    "CustomEfficientNet",
    "SECONDFPN",
    "SECONDFPN3D",
    "CustomResNet3D",
    "OccHead",
    "ViewTransformerLiftSplatShootVoxel",
]
