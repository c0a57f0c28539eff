"""JAX float split codec: exponent rANS + raw sign/significand planes."""

from .split import join_words, split_words  # noqa: F401
from .codec import (  # noqa: F401
    float_archive_buffer_bytes,
    float_compress_padded,
    float_decompress_padded,
)
