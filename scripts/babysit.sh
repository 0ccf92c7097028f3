#!/bin/bash
# babysit.sh <logfile> <stale_secs> <max_tries> <done_check> -- cmd...
#
# Runs cmd appending to <logfile>; if the log goes <stale_secs> without a
# write (the axon tunnel-wedge signature: client blocked forever in a dead
# RPC, zero CPU), kills the try, waits for the tunnel to come back, and
# retries — up to <max_tries>.  <done_check> is a shell snippet eval'd
# after each try; exit 0 when it succeeds.  Jobs must be artifact-gated /
# resumable (all round-5 queue jobs are).
LOG=$1; STALE=$2; TRIES=$3; DONE_CHECK=$4; shift 4
[ "$1" = "--" ] && shift

probe() {
  timeout 90 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256, 256)))))
EOF
}

for try in $(seq 1 "$TRIES"); do
  if eval "$DONE_CHECK"; then exit 0; fi
  until probe; do
    echo "[babysit] tunnel dead $(date); waiting" >> "$LOG"
    sleep 240
  done
  echo "[babysit] try $try: $*" >> "$LOG"
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "[babysit] log stale ${AGE}s; killing try $try $(date)" >> "$LOG"
      kill "$PID"; sleep 5; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
done
eval "$DONE_CHECK"
