#!/bin/bash
# Round-4 session B: phase attribution with the settled r4 defaults +
# batched scenario measurement. Serial, resumable via /tmp/chip_r4 DONE.
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

step profile_encode_r4 1800 python experiments/profile_encode.py
step bench_batched_r4 1800 python experiments/bench_batched.py
step profile_decode_r4 1800 python experiments/profile_decode.py
echo "SESSION B COMPLETE"
