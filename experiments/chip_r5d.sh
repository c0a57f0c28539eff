#!/bin/bash
# Round-5 session D: final state — hardware validation + TPU-gated test
# tier + full benchmark matrix + driver bench.
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

step validate_decode_d 1800 python experiments/validate_decode.py
step validate_encode_d 1800 python experiments/validate_encode.py
step validate_float_d 2400 python experiments/validate_float.py
step tpu_tests 3600 env DIETGPU_TEST_TPU=1 python -m pytest tests/test_pallas.py -q -k "tpu or shard_codec_tpu" -x
step sweep_bf16_d 2400 env DIETGPU_SWEEP_ONLY=bf16 python benchmarks/sweep.py
step sweep_f16ans_d 2400 env DIETGPU_SWEEP_ONLY=f16,ans DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step sweep_f32batch_d 2400 env DIETGPU_SWEEP_ONLY=f32,batch DIETGPU_SWEEP_MERGE=1 python benchmarks/sweep.py
step bench_final_d 1800 python bench.py
echo "SESSION D COMPLETE"
