"""Format and codec constants for dietTPU.

These mirror the DietGPU archive format so archives are bit-compatible.
Reference: /root/reference/dietgpu/ans/GpuANSUtils.cuh:17-60 and
/root/reference/dietgpu/float/GpuFloatUtils.cuh:20-23.
"""

# ANS coded/decoded word types: state u32, encoded u16, decoded u8.
ANS_STATE_BITS = 31  # states restricted to < 2^31 (GpuANSUtils.cuh:41)
ANS_ENCODED_BITS = 16  # emitted word width (GpuANSUtils.cuh:42)
ANS_ENCODED_MASK = (1 << ANS_ENCODED_BITS) - 1

# Renormalization bound / initial state: 2^15 (GpuANSUtils.cuh:46-49)
ANS_START_STATE = 1 << (ANS_STATE_BITS - ANS_ENCODED_BITS)
ANS_MIN_STATE = ANS_START_STATE

NUM_SYMBOLS = 256  # byte-oriented codec (GpuANSUtils.cuh:33)

# Bytes per independently-coded block (GpuANSUtils.cuh:37)
DEFAULT_BLOCK_SIZE = 4096

# Interleaved rANS states per block ("warp" width in the reference format;
# GpuANSUtils.cuh:62-65). Kept for archive bit-compatibility.
NUM_INTERLEAVED = 32

# Steps of NUM_INTERLEAVED symbols per full block
STEPS_PER_BLOCK = DEFAULT_BLOCK_SIZE // NUM_INTERLEAVED  # 128

# Archive integrity magic / version (GpuANSUtils.cuh:52-55)
ANS_MAGIC = 0xD00D
ANS_VERSION = 0x0001

# All compressed blocks aligned to this many bytes (GpuANSUtils.cuh:60)
BLOCK_ALIGNMENT = 16
# Encoded (u16) words per alignment unit
WORDS_PER_ALIGN = BLOCK_ALIGNMENT // 2  # 8

# Coalesced header is 8 u32 words = 32 bytes (GpuANSUtils.cuh:199-229)
COALESCED_HEADER_BYTES = 32

# Input data alignment required by the batch API (GpuANSCodec.h:16)
ANS_REQUIRED_ALIGNMENT = 4

# Default / supported probability resolutions (GpuANSCodec.h:20, :29)
DEFAULT_PROB_BITS = 10
SUPPORTED_PROB_BITS = (9, 10, 11)

# Float codec magic / version (GpuFloatUtils.cuh:20-23)
FLOAT_MAGIC = 0xF00F
FLOAT_VERSION = 0x0001
FLOAT_HEADER_BYTES = 16

# FloatType enum values (GpuFloatCodec.h:18-23)
FLOAT_TYPE_FLOAT16 = 1
FLOAT_TYPE_BFLOAT16 = 2
FLOAT_TYPE_FLOAT32 = 3


def div_up(a: int, b: int) -> int:
    return -(-a // b)


def round_up(a: int, b: int) -> int:
    return div_up(a, b) * b


def round_down(a: int, b: int) -> int:
    return (a // b) * b


def raw_comp_block_max_size(uncompressed_block_bytes: int) -> int:
    """Max bytes a block's compressed payload may occupy (zstd-style estimate).

    Reference: GpuANSEncode.cuh:31-36.
    """
    return round_up(
        uncompressed_block_bytes + uncompressed_block_bytes // 4, BLOCK_ALIGNMENT
    )


# Max u16 words per compressed 4 KiB block payload region
MAX_COMP_WORDS_PER_BLOCK = raw_comp_block_max_size(DEFAULT_BLOCK_SIZE) // 2  # 2560

# Encoders set this bit in the returned size when a block's payload exceeds
# MAX_COMP_WORDS_PER_BLOCK (the reference device-asserts instead,
# GpuANSEncode.cuh:355-360); the archive is then invalid.
SIZE_OVERFLOW_BIT = 1 << 31


def compressed_overhead(num_blocks: int) -> int:
    """Archive bytes before the compressed payload (GpuANSUtils.cuh:68-81)."""
    return (
        COALESCED_HEADER_BYTES
        + 2 * NUM_SYMBOLS  # u16 probs
        + 4 * NUM_INTERLEAVED * num_blocks  # per-block u32 warp states
        + 8 * round_up(num_blocks, 2)  # uint2 blockWords, 16B-aligned count
    )


def max_compressed_size(uncompressed_bytes: int) -> int:
    """Guaranteed-sufficient archive buffer size for any input of this size.

    Replicates the (loose) reference bound exactly, including its use of
    ``compressed_overhead(DEFAULT_BLOCK_SIZE)`` — i.e. overhead computed as if
    there were 4096 blocks. Reference: GpuANSEncode.cu:13-25.
    """
    blocks = div_up(uncompressed_bytes, DEFAULT_BLOCK_SIZE)
    raw = compressed_overhead(DEFAULT_BLOCK_SIZE)
    raw += raw_comp_block_max_size(DEFAULT_BLOCK_SIZE) * blocks
    return round_up(raw, 16)


def float_noncomp_bytes(float_type: int, size: int) -> int:
    """Bytes of the raw-stored (non-compressed) plane(s) past the float header.

    Reference: GpuFloatUtils.cuh:123-127 (f16), :163-167 (bf16), :194-203 (f32).
    """
    if float_type in (FLOAT_TYPE_FLOAT16, FLOAT_TYPE_BFLOAT16):
        return round_up(size, 16)
    if float_type == FLOAT_TYPE_FLOAT32:
        return 2 * round_up(size, 8) + round_up(size, 16)
    raise ValueError(f"bad float type {float_type}")


def float_word_size(float_type: int) -> int:
    """Bytes per float word (GpuFloatUtils.cuh:206-217)."""
    if float_type in (FLOAT_TYPE_FLOAT16, FLOAT_TYPE_BFLOAT16):
        return 2
    if float_type == FLOAT_TYPE_FLOAT32:
        return 4
    raise ValueError(f"bad float type {float_type}")


def max_float_compressed_size(float_type: int, size: int) -> int:
    """Guaranteed-sufficient archive size for `size` floats of `float_type`.

    Reference: GpuFloatCompress.cu:23-45.
    """
    return (
        FLOAT_HEADER_BYTES
        + max_compressed_size(size)
        + float_noncomp_bytes(float_type, size)
    )
