"""rgbdc_tpu — TPU-native learned RGB-D image compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
xyy7/Learning-based-RGB-D-Image-Compression (TOMM 2024, "RGB-D Data
Compression via Bi-Directional Cross-Modal Prior Transfer and Enhanced
Entropy Modeling").

Layout (top = user-facing):
  cli/        train/test entry points (same -m/-q/--channel flag surface)
  training/   trainers, RD losses, dual optimizer, orbax checkpoints
  eval/       codec testers, PSNR/MS-SSIM metrics, padding
  models/     codec zoo: elic, elic_united, elic_united_R2D, elic_master,
              ckbd (Cheng2020+checkerboard), mlicpp, stf, stf_united
  nn/         analysis/synthesis/hyper transforms, Bi-CPT (bi_spf/ESA/SE),
              contexts, entropy-parameter heads, swin stack, aligners
  entropy/    EntropyBottleneck (factorized prior), GaussianConditional,
              CDF table construction
  coder/      C++ rANS range coder (ctypes), bitstream container
  ops/        ste_round, lower_bound, GDN, checkerboard phase ops
  parallel/   device mesh + sharding helpers (DP over ICI)
  data/       NYUv2 / SUN-RGBD pipelines, pad/crop
  utils/      config, logging, misc IO

Everything is NHWC (channels-last), the native TPU conv layout; the
reference's NCHW tensors map to NHWC throughout.
"""

__version__ = "0.1.0"
