"""Dataset converters (capability rebuild of the reference
``tools/data_converter/`` suite, numpy-only, no mmcv/devkit dependencies).

Implemented:
  - kitti: detection info pickles + FOV-reduced point clouds
    (ref: tools/data_converter/kitti_converter.py, kitti_data_utils.py)
  - lyft: info pickles over a devkit-free table interface
    (ref: tools/data_converter/lyft_converter.py)
  - waymo: TFRecord -> KITTI-format conversion structure, gated on the
    optional tensorflow/waymo-open-dataset dependency
    (ref: tools/data_converter/waymo_converter.py)

De-scoped (recorded in PARITY.md): the indoor suite (scannet/s3dis/sunrgbd)
— it serves mmdet3d's indoor detectors, which are outside this framework's
model families.
"""
