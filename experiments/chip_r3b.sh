#!/bin/bash
# Round-3 session B: A/B the full-tiles op cuts, attribute encode stage
# shares, measure the dispatch floor (small-size investigation).
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

# decode: new default (full tiles + cuts) vs masked path
step b_dec_full 1200 env MWORDS=64 ITERS=32 python experiments/ab_refill.py
step b_dec_masked 1200 env MWORDS=64 ITERS=32 DIETGPU_DECODE_FULLTILES=off python experiments/ab_refill.py
# encode: stage shares with the new cuts; then masked A/B
step b_prof_encode 1800 env MWORDS=64 ITERS=32 python experiments/profile_encode.py
step b_enc_masked 1200 env MWORDS=64 ITERS=32 DIETGPU_ENCODE_FULLTILES=off python experiments/ab_flush_group.py
step b_enc_full 1200 env MWORDS=64 ITERS=32 python experiments/ab_flush_group.py
# small-size: dispatch floor + 1Mi both directions
step b_dispatch 900 env ITERS=96 python experiments/probe_dispatch.py
step b_small 1200 env DIETGPU_BENCH_MWORDS=1 DIETGPU_BENCH_ITERS=96 python bench.py
step b_prof_decode 1800 env MWORDS=64 ITERS=32 python experiments/profile_decode.py
echo "== session B complete; logs in $LOGDIR"
