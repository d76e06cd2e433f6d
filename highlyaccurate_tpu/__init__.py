"""highlyaccurate_tpu: TPU-native cross-view vehicle localization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
YujiaoShi/HighlyAccurate ("Beyond Cross-view Image Retrieval: Highly Accurate
Vehicle Localization Using Satellite Image", CVPR 2022): two-branch VGG16-UNet
feature pyramids, differentiable satellite<->ground geometry projection, and an
unrolled Levenberg-Marquardt pose solver — all jitted, batched, vmappable over
pose hypotheses, and shardable over a TPU device mesh.
"""

__version__ = "0.1.0"

from highlyaccurate_tpu.config import Config  # noqa: F401
