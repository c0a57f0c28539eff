#!/bin/bash
# Round-3 session A: hardware validation of the post-r2 commits, then
# baseline numbers for the paths VERDICT r2 flagged as unmeasured
# (one-grid batched encode, spanning-tile decode, fused decode checksum).
# Serial (one TPU process at a time), resumable via DONE markers.
set -u
LOGDIR=/tmp/chip_r3
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

probe() {
  timeout 240 python -c "
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

# no up-front probe: the wait_and_run watcher already proved the chip
# answers, and a second immediate probe can collide with worker recovery

step validate_encode 900 python experiments/validate_encode.py
step validate_decode 900 python experiments/validate_decode.py
step validate_float  900 python experiments/validate_float.py
step validate_batched 1200 python experiments/validate_batched.py
step bench_batched 1800 env B=128 MEMKW=512 ITERS=24 python experiments/bench_batched.py
step ab_cksum 1200 env MWORDS=64 ITERS=32 python experiments/ab_cksum.py
step bench_single 1200 env DIETGPU_BENCH_MWORDS=64 DIETGPU_BENCH_ITERS=32 python bench.py
step tune_tile 2400 env MWORDS=64 python experiments/tune_tile.py 512 1024 2048
echo "== session A complete; logs in $LOGDIR"
