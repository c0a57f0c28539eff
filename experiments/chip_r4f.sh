#!/bin/bash
# Round-4 session F: validate the in-place container assembly on
# hardware, settle the encode number, then regenerate the FULL benchmark
# matrix (results.json), the batched scenario, and the driver bench.
set -u
LOGDIR=/tmp/chip_r4
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "
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
      tail -14 "$log"
      return 0
    fi
    echo "-- $name failed/timed out; log tail:"
    tail -6 "$log"
    echo "-- waiting 150s for worker recovery"
    sleep 150
    if ! probe; then
      echo "-- chip not answering; aborting session (rerun to resume)"
      exit 1
    fi
  done
  echo "-- $name failed twice; continuing with next step"
  return 1
}

step validate_encode_f 1500 python experiments/validate_encode.py
step validate_float_f 1800 python experiments/validate_float.py
step ab_enc_f 1500 python experiments/ab_r4c_encode.py
step sweep_bf16 2400 env DIETGPU_SWEEP_ONLY=bf16 python benchmarks/sweep.py
step sweep_f16 2400 env DIETGPU_SWEEP_ONLY=f16,ans DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step sweep_f32 2400 env DIETGPU_SWEEP_ONLY=f32,batch DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step bench_final 1800 python bench.py
echo "SESSION F COMPLETE"
