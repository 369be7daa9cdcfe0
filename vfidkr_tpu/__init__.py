"""vfidkr_tpu — TPU-native video frame interpolation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
"Video Frame Interpolation Based on Deformable Kernel Region"
(I2-Multimedia-Lab, arXiv:2204.11396).  The reference is a PyTorch 1.4 +
hand-written CUDA-extension codebase; this framework re-implements every
component TPU-first:

- ``vfidkr_tpu.ops``      — the nine native CUDA extension ops of the reference
  (``my_package/*``, ``PWCNet/correlation_package_pytorch1_0``) as pure-JAX /
  Pallas ops with reference-exact forward AND backward semantics.
- ``vfidkr_tpu.models``   — PWC-Net, MonoNet5 kernel-prediction U-Net, S2DF
  context net, MegaDepth hourglass, rectifier, and the DAIN /
  DAIN_slowmotion top-level models as flax.linen modules.
- ``vfidkr_tpu.parallel`` — device-mesh data/spatial parallelism (the
  reference is single-GPU; here DP/spatial-sharding are first-class).
- ``vfidkr_tpu.data``     — Vimeo-90K triplet pipeline with the reference's
  augmentations, plus host-side prefetch.
- ``vfidkr_tpu.training`` — Adamax multi-LR training loop, Charbonnier/TV/sym
  losses, ReduceLROnPlateau, checkpointing with filtered partial restore.
"""

__version__ = "0.1.0"
