"""Profiling hooks: the reference's profilerStart/profilerStop parity.

The reference exposes range-scoped profiler capture (cudaProfilerStart/Stop,
utils/DeviceUtils.cpp:48-54) and event timing. TPU-natively:

  * `profiler_start(logdir)` / `profiler_stop()` wrap jax.profiler
    start_trace/stop_trace — capture a TensorBoard/XProf trace of every
    device op in the range.
  * `annotate(name)` wraps jax.named_scope: inside jit it tags the HLO (and
    thus the trace timeline) with the pipeline stage name; zero runtime
    cost. The codec pipelines use it for their stages so traces attribute
    time across split / stats / encode-kernel / assembly / decode-kernel /
    join.
  * `trace_annotation(name)` wraps jax.profiler.TraceAnnotation for
    host-side ranges.
"""

from __future__ import annotations

import contextlib

import jax


def profiler_start(logdir: str) -> None:
    """Begin a profiler capture (reference: profilerStart via
    cudaProfilerStart, DeviceUtils.cpp:48-51)."""
    jax.profiler.start_trace(logdir)


def profiler_stop() -> None:
    """End the capture (reference: profilerStop, DeviceUtils.cpp:53-54)."""
    jax.profiler.stop_trace()


def annotate(name: str):
    """Stage annotation usable under jit (HLO metadata / trace label)."""
    return jax.named_scope(f"dietgpu.{name}")


@contextlib.contextmanager
def trace_annotation(name: str):
    """Host-side range annotation for profiler timelines."""
    with jax.profiler.TraceAnnotation(f"dietgpu.{name}"):
        yield
