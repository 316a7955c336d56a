"""spfsplatv2_tpu — a TPU-native JAX/XLA/Pallas framework for feed-forward,
pose-free 3D Gaussian splatting from sparse views.

Re-designed from scratch for TPU (MXU-friendly dense compute, static shapes,
SPMD sharding over `jax.sharding.Mesh`) with the capabilities of the reference
PyTorch/CUDA system `ranrhuang/SPFSplatV2` (see SURVEY.md).

Layout:
    geometry/   pure-function camera & pose math (SE3, projection, pointclouds)
    ops/        compute kernels: differentiable rasterizer, SH, attention, RoPE
    models/     flax modules: CroCo/VGGT backbones, DPT & pose heads, encoders
    losses/     MSE / LPIPS / reprojection / SSIM / distillation losses
    training/   optimizer, train step, checkpointing
    data/       chunked dataset reader, view samplers, shims
    parallel/   mesh construction and sharding rules
    evaluation/ image & pose metrics, benchmarker
    utils/      checkpoint conversion, PLY export, misc
"""

__version__ = "0.1.0"

from spfsplatv2_tpu.gaussians import Gaussians

__all__ = ["Gaussians"]
