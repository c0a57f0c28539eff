"""True multi-process runtime test (VERDICT #3): two OS processes, two
virtual CPU devices each, joined into one 4-device global mesh by
jax.distributed (gloo — the CPU stand-in for ICI/DCN).

This exercises the code path the single-process 8-device mesh cannot:
cross-process collectives, addressable-shard locality, and the
initialize_multihost bootstrap. The worker (multiproc_worker.py) validates
shard-codec bit-exactness vs the oracle and a compressed all-gather.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(__file__)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_mesh():
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        # the workers set their own platform/device config
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIPROC PASS {pid}" in out, f"worker {pid} output:\n{out}"
