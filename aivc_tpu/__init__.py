"""aivc_tpu — a TPU-native learned video codec framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
AIVC reference codec (Orange-OpenSource/AIVC): two conditional
convolutional autoencoders per frame (MOFNet for motion + coding-mode
selection, CodecNet for conditional residual coding), hyperprior entropy
models, a real range-coded bitstream, and All-Intra / Low-delay P /
hierarchical-B Random-Access coding structures with a 7-point rate
ladder plus continuously-variable rate via interpolated gain vectors.

Compute path is pure-functional JAX compiled by XLA (with Pallas
kernels for hot ops); the entropy-coding backend is a first-party C++
range coder over quantized integer CDFs; multi-chip scaling uses
jax.sharding meshes (GSPMD spatial partitioning + batched temporal
layers) instead of the reference's single-GPU frame loop.
"""

__version__ = "0.1.0"

from aivc_tpu.config import (  # noqa: F401
    ConditionalNetConfig,
    ModelConfig,
    CodingConfig,
)
