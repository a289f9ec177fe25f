"""stereoscene_tpu: TPU-native rebuild of StereoScene/BRGScene (IJCAI 2024).

A from-scratch JAX/XLA/Pallas/pjit framework for camera-only 3D semantic scene
completion on SemanticKITTI, with the full capability surface of the reference
(Arlo0o/StereoScene, mounted at /root/reference) but an idiomatic TPU design:

- channels-last layouts everywhere (NHWC / NDHWC / XYZC voxel grids),
- bf16 compute with fp32 parameter/softmax/loss islands,
- a single jitted train/eval step over a `jax.sharding.Mesh`,
- XLA/Pallas kernels for the hot ops (voxel pooling, GWC cost volume,
  confidence-reweighted BRI attention),
- orbax checkpointing and collective-reduced SSC metrics.

Layer map (mirrors SURVEY.md section 1):
  geometry.py        frustum / lift-splat geometry, camera MLP encodings
  ops/               custom compute kernels (voxel pool, gwc, warp, attention)
  models/            flax.linen model zoo (EfficientNet, FPNs, DepthNet,
                     stereo volume encoder, MIE, 3D ResNet, OccHead, detector)
  losses/            SemanticKITTI SSC losses (CE/sem_scal/geo_scal/lovasz/...)
  metrics.py         SSCMetrics as a pytree with psum-reducible state
  data/              SemanticKITTI dataset, preprocessing, host input pipeline
  parallel/          mesh + sharding helpers
  engine/            train/eval orchestration
  utils/             checkpoint conversion, profiling
"""

__version__ = "0.1.0"
