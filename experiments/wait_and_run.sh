#!/bin/bash
# Wait (idle) until the axon-tunneled TPU answers, then run the given
# session script. Probes at most once every 4 min so the worker gets the
# idle time it needs to auto-recover.
set -u
SCRIPT=${1:?usage: wait_and_run.sh <session-script>}
for i in $(seq 1 40); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.arange(8.0).sum()))" >/dev/null 2>&1; then
    echo "chip up after $i probes; running $SCRIPT"
    exec bash "$SCRIPT"
  fi
  echo "probe $i failed; sleeping 240s"
  sleep 240
done
echo "chip never answered"
exit 1
