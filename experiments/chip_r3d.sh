#!/bin/bash
# Round-3 session D: refresh the committed results.json rows with the
# current defaults (truth maintenance, VERDICT r2 weak #6), then phase
# attribution for the next optimization round. Resumable via DONE markers.
set -u
LOGDIR=/tmp/chip_r3
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
      tail -12 "$log"
      return 0
    fi
    echo "-- $name failed/timed out; log tail:"
    tail -5 "$log"
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

# truth refresh: merge-update results.json chunk by chunk
step sweep_bf16 2400 env DIETGPU_SWEEP_ONLY=bf16 DIETGPU_SWEEP_SIZES=1,16,64,128 DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step sweep_f16f32 2400 env DIETGPU_SWEEP_ONLY=f16,f32 DIETGPU_SWEEP_SIZES=64 DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step sweep_ansbatch 2400 env DIETGPU_SWEEP_ONLY=ans,batch DIETGPU_SWEEP_SIZES=64 DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
# phase attribution with the op-golfed kernels
step prof_decode 1800 env MWORDS=64 ITERS=32 python experiments/profile_decode.py
step prof_encode 1800 env MWORDS=64 ITERS=32 python experiments/profile_encode.py
echo "== session D complete; logs in $LOGDIR"
