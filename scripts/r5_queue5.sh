#!/bin/bash
# Round-5 TPU queue, part 5 — ADAPTIVE replacement for queue3+queue4.
# Rationale: queue3 computed the optimal-policy-observer (OPO) deadline at
# row START (09:01), then the tunnel died for an hour+; with fixed
# deadlines a late tunnel return would skip the flagship OPO row and give
# the remaining window to the lesser optimal-observer (OO) row.  This
# queue instead sizes deadlines from the moment the tunnel ACTUALLY
# returns, with OPO holding first claim on the window, then runs the
# merge, then the leftovers (bench under kernel D, wall-sized bf16 PINO
# pretrain).  All rows bank partials per heartbeat chunk (drag_study.py
# DRAG_DEADLINE) so nothing is ever lost to a wedge or the round wall.
cd /root/repo || exit 1
LOG=results/logs/drag_study_r5.log
QLOG=results/logs/r5_queue5.log
log() { echo "[queue5 $(date +%H:%M:%S)] $*" >> "$QLOG"; }
round_end() { cat /root/repo/.round_end 2>/dev/null || date -d '12:05' +%s; }

probe() {
  timeout 90 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256, 256)))))
EOF
}
wait_tunnel() { until probe; do log "tunnel dead; waiting"; sleep 150; done; }

row() {  # row <name> <deadline_epoch>
  local NAME=$1 DL=$2
  local NPZ=outputs/drag_study/$NAME.npz
  [ -f "$NPZ" ] && return 0
  local NOW
  NOW=$(date +%s)
  if [ "$NOW" -ge "$DL" ]; then
    log "row $NAME: deadline already passed"
  else
    log "row $NAME until $(date -d @"$DL" +%H:%M:%S)"
    DRAG_DEADLINE=$DL bash scripts/babysit.sh "$LOG" 480 4 \
      "[ -f $NPZ ]" -- \
      env "DRAG_ONLY=$NAME" "DRAG_DEADLINE=$DL" \
      timeout $(( DL - NOW + 300 )) python scripts/drag_study.py 50000
    log "row $NAME rc=$?"
  fi
  if [ ! -f "$NPZ" ] && [ -f "outputs/drag_study/$NAME.partial.npz" ]; then
    DRAG_PROMOTE=$NAME DRAG_ONLY=$NAME timeout 600 \
      python scripts/drag_study.py 50000 >> "$LOG" 2>&1
    log "row $NAME partial promoted rc=$?"
  fi
}

log "queue5 start (adaptive; replaces queue3/queue4)"
wait_tunnel
END=$(round_end); NOW=$(date +%s); R=$(( END - NOW ))
log "tunnel up; ${R}s to round end"
if [ "$R" -ge 2700 ]; then
  # comfortable window: OPO gets all but 25 min (OO ~15 + merge/bench ~10)
  row optimal-policy-observer $(( END - 1500 ))
  row optimal-observer        $(( END - 600 ))
else
  # tight window: the flagship takes everything but the merge reserve;
  # OO gets a sliver only if OPO finished early
  row optimal-policy-observer $(( END - 600 ))
  row optimal-observer        $(( END - 480 ))
fi

# merge: cached rows load instantly; a still-missing row gets one
# deadline-bounded attempt inside the same process
log "merge"
wait_tunnel
DRAG_PROMOTE=optimal-policy-observer,optimal-observer,ddpg \
  DRAG_DEADLINE=$(( $(round_end) - 120 )) timeout 1200 \
  python scripts/drag_study.py 50000 >> "$LOG" 2>&1
log "merge rc=$?"

# leftovers, in value order
NOW=$(date +%s); R=$(( $(round_end) - NOW ))
if [ "$R" -ge 480 ] && [ ! -f results/logs/bench_r5_kernelD.txt ]; then
  wait_tunnel
  log "bench under kernel D"
  timeout 420 python bench.py > results/logs/bench_r5_kernelD.txt 2>&1
  log "bench rc=$?"
fi
NOW=$(date +%s); R=$(( $(round_end) - NOW ))
if [ "$R" -ge 1200 ]; then
  ITERS=$(( (R - 600) * 1000 / 190 ))
  [ "$ITERS" -gt 20001 ] && ITERS=20001
  CFG=/tmp/pino_bf16_r5.yaml
  sed -e "s/iterations: 20001/iterations: $ITERS/" \
      -e "s/save_interval: 2000/save_interval: 500/" \
      configs/pino-observer-pretrain-1s-bf16.yaml > "$CFG"
  BLOB=outputs/pino-pretrain-bf16.msgpack.resume.npy
  RESUME=""
  [ -f "$BLOB" ] && RESUME="--resume $BLOB"
  log "pino bf16: $ITERS iters $RESUME"
  timeout $(( R - 180 )) python train_pino.py --config "$CFG" $RESUME \
    >> results/logs/pino_pretrain_bf16_r5.log 2>&1
  log "pino rc=$?"
fi
log "queue5 done"
