"""dietTPU: TPU-native lossless compression for numerical data.

A brand-new JAX/XLA/Pallas framework with the capabilities of DietGPU
(facebookresearch/dietgpu): a batched byte-oriented rANS entropy codec and a
float codec that splits fp16/bf16/fp32 words into a compressible exponent
stream (rANS-coded) plus raw-packed sign/significand planes. Archives are
bit-compatible with the reference format.

Public API lives in :mod:`dietgpu_tpu.api`.
"""

from . import constants  # noqa: F401

__version__ = "0.1.0"
