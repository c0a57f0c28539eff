"""Backend selection: Pallas (Mosaic) kernels on TPU, pure-XLA elsewhere.

The two backends implement the identical archive format and bit-identical
results; the XLA path additionally serves as the differentiable-from-anywhere
reference and runs on CPU for hermetic tests. Selection:

  * env DIETTPU_BACKEND = "pallas" | "xla" forces a backend
  * otherwise Pallas on TPU-like platforms, XLA elsewhere
"""

from __future__ import annotations

import os

import jax

_TPU_PLATFORMS = ("tpu", "axon")


def default_backend() -> str:
    forced = os.environ.get("DIETTPU_BACKEND")
    if forced in ("pallas", "xla"):
        return forced
    try:
        platform = jax.devices()[0].platform
    except Exception:  # noqa: BLE001 — no backend initialized yet
        return "xla"
    return "pallas" if platform in _TPU_PLATFORMS else "xla"


def ans_encode_padded(data, length, prob_bits, use_checksum=False,
                      precomputed_histogram=None, precomputed_pdf=None,
                      backend: str | None = None):
    backend = backend or default_backend()
    if backend == "pallas":
        from .ans import pallas_encode

        return pallas_encode.ans_encode_padded_pallas(
            data, length, prob_bits, use_checksum,
            precomputed_histogram, precomputed_pdf,
        )
    from .ans import encode

    return encode.ans_encode_padded(
        data, length, prob_bits, use_checksum,
        precomputed_histogram, precomputed_pdf,
    )


def ans_decode_padded(archive, prob_bits, out_max, verify_checksum=False,
                      backend: str | None = None,
                      static_length: int | None = None):
    backend = backend or default_backend()
    if backend == "pallas":
        from .ans import pallas_decode

        return pallas_decode.ans_decode_padded_pallas(
            archive, prob_bits, out_max, verify_checksum,
            # trace-time full-capacity knowledge -> unmasked hot loop
            static_full=static_length is not None
            and static_length == out_max,
        )
    from .ans import decode

    return decode.ans_decode_padded(
        archive, prob_bits, out_max, verify_checksum
    )


def histogram_u8(data, length, backend: str | None = None):
    """Routed exact 256-bin byte histogram (u8 or packed-u32 input)."""
    backend = backend or default_backend()
    if backend == "pallas":
        from .ans import layout, pallas_hist

        d32 = data if data.dtype != "uint8" else layout.u8_to_u32le(data)
        return pallas_hist.histogram_u8_pallas(d32.astype("int32"), length)
    from .ans import stats

    return stats.histogram_u8(data, length)
