"""icl_tpu — TPU-native (JAX/XLA/Pallas) framework for Inherent Consistent
Learning semi-supervised medical image segmentation.

A ground-up rebuild of the capabilities of zhuye98/ICL (MIDL'23,
arXiv:2303.14175) designed TPU-first:

- Models are Flax modules in NHWC/NDHWC layout feeding the MXU through
  XLA convolutions and fused Pallas attention kernels.
- Training is a single jitted step (loss + grads + SGD update + poly LR)
  with data-parallel sharding over a `jax.sharding.Mesh`, not an eager
  per-op Python loop.
- Sliding-window / per-slice inference is batched into single XLA
  programs instead of per-patch host↔device round trips.
- Checkpointing via Orbax, with converters for the reference's torch
  checkpoint dialects.

Subpackages:
    icl_tpu.models    — UNet 2D/3D, Swin-UNet 2D, SwinUNETR 3D, ICL heads
    icl_tpu.losses    — exact training objective of the reference
    icl_tpu.metrics   — Dice / HD95 with reference sentinels
    icl_tpu.data      — h5/NIfTI datasets, TwoStream sampler, augmentations
    icl_tpu.train     — Trainer, optimizer, train steps
    icl_tpu.eval      — batched slice / fused sliding-window inference
    icl_tpu.parallel  — mesh + sharding utilities
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ICL_TPU_PLATFORM"):
    # Backend override honored even where a sitecustomize force-registers
    # a TPU plugin and stomps JAX_PLATFORMS from the environment (this
    # container does): jax.config wins over both as long as it runs
    # before backend initialization. Lets CLI runs fall back to CPU when
    # the chip/tunnel is unavailable: ICL_TPU_PLATFORM=cpu.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ICL_TPU_PLATFORM"])
