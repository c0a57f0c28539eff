"""Multi-host runtime bootstrap.

The reference is a single-GPU library; multi-host operation is a TPU-build
obligation (BASELINE.md: >=90% weak scaling at 2+ hosts). JAX's runtime
model: one process per host, `jax.distributed.initialize` wires them into
one global runtime, and every `jax.device_put`/`pjit`/`shard_map` over a
global Mesh then spans hosts transparently — the collectives in
:mod:`.collectives` and the shard codec in :mod:`.sharding` work unchanged
on a multi-host mesh (ICI within a slice, DCN across slices).

Typical launch (per host)::

    from dietgpu_tpu.parallel import initialize_multihost, make_mesh
    initialize_multihost()            # TPU pods: all args auto-detected
    mesh = make_mesh(len(jax.devices()))   # GLOBAL device count
    ...

On non-TPU fleets pass coordinator_address/num_processes/process_id
explicitly (or set JAX_COORDINATOR_ADDRESS etc.).
"""

from __future__ import annotations

import jax


_initialized = False


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Idempotent wrapper around jax.distributed.initialize.

    Returns True if a multi-process runtime was initialized (or already
    was), False when running single-process (all args None and no
    coordination env present) — single-process callers can simply always
    call this first.
    """
    global _initialized
    if _initialized:
        return True
    import os

    implicit = (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and "JAX_COORDINATOR_ADDRESS" not in os.environ
        and "COORDINATOR_ADDRESS" not in os.environ
    )
    if implicit:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    return True
