#!/bin/bash
# Round-3 session C: prioritized measure-and-optimize order for a short
# wall-clock window. Validation of the unmeasured post-r2 commits first,
# then the knobs most likely to move the headline decode number, then the
# benchmark refresh. Serial (one TPU process at a time), resumable via
# DONE markers in /tmp/chip_r3.
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

# 1. bit-exactness of everything that landed since the last hardware run
step validate_decode 900 python experiments/validate_decode.py
step validate_float  900 python experiments/validate_float.py
step validate_encode 900 python experiments/validate_encode.py
# 2. decode refill cadence A/B (lazy vs eager; validates bit-exactness too)
step ab_refill_lazy  1200 env MWORDS=64 ITERS=32 DIETGPU_DECODE_REFILL=lazy python experiments/ab_refill.py
step ab_refill_eager 1200 env MWORDS=64 ITERS=32 python experiments/ab_refill.py
# 3. headline bench at 64Mi with current defaults
step bench_single 1200 env DIETGPU_BENCH_MWORDS=64 DIETGPU_BENCH_ITERS=32 python bench.py
# 4. batched scenario (one-grid encode + spanning-tile decode, unmeasured)
step validate_batched 1200 python experiments/validate_batched.py
step bench_batched 1800 env B=128 MEMKW=512 ITERS=24 python experiments/bench_batched.py
# 5. fused decode checksum cost
step ab_cksum 1200 env MWORDS=64 ITERS=32 python experiments/ab_cksum.py
# 6. small-size + dispatch floor
step b_small 1200 env DIETGPU_BENCH_MWORDS=1 DIETGPU_BENCH_ITERS=96 python bench.py
step b_dispatch 900 env ITERS=96 python experiments/probe_dispatch.py
# 7. encode A/B knobs
step ab_flush_group 1200 env MWORDS=64 ITERS=32 python experiments/ab_flush_group.py
step ab_divmode 900 env MWORDS=64 ITERS=32 python experiments/ab_divmode.py
# 8. decode tile retune at exact-divisor sizes
step tune_tile 2400 env MWORDS=64 python experiments/tune_tile.py 512 1024 2048
echo "== session C complete; logs in $LOGDIR"
