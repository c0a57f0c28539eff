"""JAX (XLA-jittable) implementation of the interleaved-rANS codec.

Works on any JAX backend with static shapes; the Pallas TPU fast paths in
:mod:`dietgpu_tpu.ops` plug into the same pipeline.
"""

from .checksum import checksum_u8  # noqa: F401
from .stats import div_magic_u32, histogram_u8, normalize_probs  # noqa: F401
from .encode import ans_encode_padded, encode_scratch_bytes  # noqa: F401
from .decode import ans_decode_padded  # noqa: F401
