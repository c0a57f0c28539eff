#!/bin/bash
# Round-4 session E: batched-decode attribution (in-kernel ablation, one
# process per arm) + batched XLA-glue pieces + the fixed container-phase
# profile + tile=1024 retry. Serial, resumable.
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

for A in "" realign read lut refill "realign,read,lut,refill,rank,pack"; do
  tag=$(echo "ab_${A:-none}" | tr ',' '-')
  DIETGPU_DECODE_ABLATE="$A" step "batched_$tag" 1200 \
    python experiments/ablate_batched.py
done
step profile_batched2_e 1500 python experiments/profile_batched2.py
ITERS=96 step profile_encode_e 2400 python experiments/profile_encode.py
DIETGPU_ENCODE_TILE=1024 step enc_tile1024 1200 python experiments/ab_r4c_encode.py
echo "SESSION E COMPLETE"
