#!/bin/bash
# Round-5 session C: static refill chain A/B + encode flush-group re-test.
set -u
LOGDIR=/tmp/chip_r5
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."
step() {
  local name=$1 tmo=$2; shift 2
  local log="$LOGDIR/$name.log"
  if [ -f "$log" ] && grep -qx DONE "$log"; then
    echo "== $name: already done, skipping"; return 0
  fi
  echo "== $name (timeout ${tmo}s)"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    echo DONE >> "$log"; tail -16 "$log"; return 0
  fi
  echo "-- $name failed/timed out; log tail:"; tail -8 "$log"; return 1
}
step ab_static 3600 python experiments/ab_r5_static.py
echo "SESSION C COMPLETE"
