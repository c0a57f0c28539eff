#!/bin/bash
# Ordered hardware session: validate -> A/B -> refresh benchmarks.
#
# Run when the axon-tunneled TPU comes back. Steps run SERIALLY (one TPU
# process at a time), each under a timeout with its own log under
# /tmp/chip_r2/; a step is skipped if its log already ends in DONE, so
# the script is resumable after worker crashes (which auto-recover in
# ~2-3 min of idle — the script sleeps and retries once per step).
#
# Order matters: bit-exactness validation first (cheap, catches bad
# kernels before they waste bench time), then the A/B knobs landed this
# round (flush group, nc modes), then the benchmark matrix.
set -u
LOGDIR=/tmp/chip_r2
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.arange(8.0).sum()))" >/dev/null 2>&1
}

step() {
  local name=$1 tmo=$2; shift 2
  local log="$LOGDIR/$name.log"
  if [ -f "$log" ] && grep -qx DONE "$log"; then
    echo "== $name: already done, skipping"
    return 0
  fi
  for attempt in 1 2; do
    echo "== $name (attempt $attempt, timeout ${tmo}s)"
    if timeout "$tmo" "$@" > "$log" 2>&1; then
      echo DONE >> "$log"
      tail -15 "$log"
      return 0
    fi
    echo "-- $name failed/timed out; log tail:"
    tail -5 "$log"
    echo "-- waiting 180s for worker recovery"
    sleep 180
    if ! probe; then
      echo "-- chip not answering; aborting session (rerun to resume)"
      exit 1
    fi
  done
  echo "-- $name failed twice; continuing with next step"
  return 1
}

if ! probe; then
  echo "chip not answering; try later"
  exit 1
fi

step validate_encode 900 python experiments/validate_encode.py
step validate_decode 900 python experiments/validate_decode.py
step validate_float  900 python experiments/validate_float.py
step validate_batched 900 python experiments/validate_batched.py
step ab_flush_group 900 env MWORDS=64 ITERS=32 python experiments/ab_flush_group.py
step ab_ncmode 1800 env MWORDS=64 ITERS=32 python experiments/ab_ncmode.py
step ab_divmode 900 env MWORDS=64 ITERS=32 python experiments/ab_divmode.py
# T=256 (bt=1024) divides the 64Mi-word grid exactly (2048 rows); the round-2
# T=192 regression was confounded by 12.5% grid padding at this size.
step tune_tile 1800 env MWORDS=64 python experiments/tune_tile.py 512 1024 2048
step tpu_pytest 3600 env DIETGPU_TEST_TPU=1 python -m pytest tests/test_pallas.py -q -k tpu
step sweep 5400 python benchmarks/sweep.py
step bench 1200 python bench.py
echo "== session complete; logs in $LOGDIR"
