#!/bin/bash
# Round-5 TPU queue, part 3 — the restart after the session death that
# killed queue2 mid-OPO-row (08:1x UTC).  Differences from queue2:
#   * detached launch (setsid) so a session death can't kill it again
#   * drag rows bank partials every heartbeat chunk (drag_study.py
#     DRAG_DEADLINE/DRAG_PROMOTE) — a wedge or the round wall never
#     loses a row, it just bounds its step count
#   * per-row deadlines computed when the row STARTS, from
#     /root/repo/.round_end (editable live to extend/shrink the budget)
cd /root/repo || exit 1
LOG=results/logs/drag_study_r5.log
QLOG=results/logs/r5_queue3.log
log() { echo "[queue3 $(date +%H:%M:%S)] $*" >> "$QLOG"; }
round_end() { cat /root/repo/.round_end 2>/dev/null || date -d '12:05' +%s; }

probe() {
  timeout 90 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256, 256)))))
EOF
}
wait_tunnel() { until probe; do log "tunnel dead; waiting"; sleep 180; done; }

log "queue3 start; round_end=$(date -d @"$(round_end)" +%H:%M:%S)"

# 1. ddpg drag row — plain-rate (minutes at ~5k steps/s)
if [ ! -f outputs/drag_study/ddpg.npz ]; then
  wait_tunnel; log "job 1: ddpg row"
  DRAG_ONLY=ddpg timeout 2400 python scripts/drag_study.py 50000 >> "$LOG" 2>&1
  log "job 1 rc=$?"
fi

# 2. fullstep probe (kernel D on-chip A/B, VERDICT item 3)
if ! grep -q "fullstep=True B= 32" results/logs/fullstep_probe_r5.log 2>/dev/null; then
  wait_tunnel; log "job 2: fullstep probe"
  timeout 2700 python scripts/fullstep_probe.py 3 \
    > results/logs/fullstep_probe_r5.log 2>&1
  log "job 2 rc=$?"
fi

# 3+4. gradient drag rows under the babysitter, deadline-bounded.
#      OPO gets the lion's share (the 3-round flagship); OO the rest.
grad_row() {  # grad_row <name> <reserve_secs_after_this_row>
  local NAME=$1 RESERVE=$2
  local NPZ="outputs/drag_study/$NAME.npz"
  [ -f "$NPZ" ] && return 0
  local DL=$(( $(round_end) - RESERVE ))
  if [ "$(date +%s)" -ge "$DL" ]; then
    log "row $NAME: no time left (deadline passed); promoting partial if any"
  else
    log "row $NAME until $(date -d @"$DL" +%H:%M:%S)"
    wait_tunnel
    DRAG_DEADLINE=$DL bash scripts/babysit.sh "$LOG" 480 4 \
      "[ -f $NPZ ]" -- \
      env "DRAG_ONLY=$NAME" "DRAG_DEADLINE=$DL" \
      timeout $(( DL - $(date +%s) + 600 )) python scripts/drag_study.py 50000
    log "row $NAME babysit rc=$?"
  fi
  if [ ! -f "$NPZ" ] && [ -f "outputs/drag_study/$NAME.partial.npz" ]; then
    DRAG_PROMOTE=$NAME DRAG_ONLY=$NAME timeout 900 \
      python scripts/drag_study.py 50000 >> "$LOG" 2>&1
    log "row $NAME partial promoted rc=$?"
  fi
}
# leave ~72 min after OPO (60 for OO + 12 reserve); ~12 min after OO
grad_row optimal-policy-observer $(( 72 * 60 ))
grad_row optimal-observer       $(( 12 * 60 ))

# 5. merge: all rows from cache -> full table + summary.json
wait_tunnel; log "merge"
DRAG_PROMOTE=optimal-policy-observer,optimal-observer,ddpg \
  DRAG_DEADLINE=$(( $(round_end) - 300 )) timeout 1500 \
  python scripts/drag_study.py 50000 >> "$LOG" 2>&1
log "merge rc=$?"
log "queue3 done"
