#!/bin/bash
# Round-5 session A: roofline synthetic ceiling + HBM BW, then the
# pipelined-bounds A/Bs (decode refill, encode flush).
set -u
LOGDIR=/tmp/chip_r5
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
      tail -16 "$log"
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

step roofline 1800 python experiments/roofline_kernel.py
step ab_refill 2400 python experiments/ab_r5_refill.py
step ab_encode 2400 python experiments/ab_r5_encode.py
step midsize 2400 python experiments/probe_midsize.py
step midsize_ablate 2400 env DIETGPU_DECODE_ABLATE=realign,read,rank,pack,lut python experiments/probe_midsize.py
echo "SESSION A COMPLETE"
