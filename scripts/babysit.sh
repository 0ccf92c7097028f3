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

# Persistent compile cache for the probe AND the babysat job: the probe's
# tiny matmul costs ~80 s of remote compile cold (observed 2026-08-21,
# racing the old 90 s timeout), so a sub-2-minute tunnel blip could never
# pass the gate.  With the cache warm the probe is an RPC round trip.
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.3
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0

probe() {
  timeout 150 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256, 256)))))
EOF
}

for try in $(seq 1 "$TRIES"); do
  if eval "$DONE_CHECK"; then exit 0; fi
  until probe; do
    echo "[babysit] tunnel dead $(date); waiting" >> "$LOG"
    sleep 120
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
