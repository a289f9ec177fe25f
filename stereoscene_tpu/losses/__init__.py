from .semkitti import (
    SEMANTIC_KITTI_CLASS_FREQUENCIES,
    KITTI_CLASS_NAMES,
    ce_ssc_loss,
    sem_scal_loss,
    geo_scal_loss,
    kl_sep,
    ohem_ce_ssc_loss,
    class_weights_from_frequencies,
)
from .lovasz import lovasz_softmax
from .depth import downsample_gt_depth, bce_depth_loss
from .extras import (
    soft_dice_loss,
    position_aware_loss,
    frustum_proportion_loss,
    gaussian_depth_target,
    klv_depth_loss,
    local_geometric_anisotropy,
)

__all__ = [
    "SEMANTIC_KITTI_CLASS_FREQUENCIES",
    "KITTI_CLASS_NAMES",
    "ce_ssc_loss",
    "sem_scal_loss",
    "geo_scal_loss",
    "kl_sep",
    "ohem_ce_ssc_loss",
    "class_weights_from_frequencies",
    "lovasz_softmax",
    "downsample_gt_depth",
    "bce_depth_loss",
    "soft_dice_loss",
    "position_aware_loss",
    "frustum_proportion_loss",
    "gaussian_depth_target",
    "klv_depth_loss",
    "local_geometric_anisotropy",
]
