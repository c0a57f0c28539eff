"""Multi-chip / multi-host scaling: sharded codec + compressed collectives."""

from .sharding import (  # noqa: F401
    make_mesh,
    shard_compress,
    shard_decompress,
)
from .collectives import (  # noqa: F401
    compressed_all_gather,
    compressed_all_gather_auto,
    compressed_all_reduce,
    compressed_all_to_all,
    compressed_ppermute,
    compressed_reduce_scatter,
)
from .runtime import initialize_multihost  # noqa: F401
