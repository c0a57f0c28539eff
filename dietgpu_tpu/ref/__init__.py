"""CPU-exact NumPy reference implementation of the dietTPU/DietGPU formats.

This is the correctness oracle: a vectorized, bit-exact model of the archive
format and the interleaved rANS state machines. Every device path (JAX/XLA,
Pallas, native C++) is validated against it.
"""

from .ans_ref import (  # noqa: F401
    ans_decode,
    ans_encode,
    build_decode_lut,
    checksum_bytes,
    div_magic,
    histogram_u8,
    normalize_probs,
    parse_header,
)
from .float_ref import (  # noqa: F401
    float_decompress,
    float_compress,
    float_join,
    float_split,
    parse_float_header,
)
