#!/bin/bash
# Round-5 continuation queue (second session, 2026-08-21).  The first
# round-5 session lost its flagship window to the 09:02 tunnel outage and
# the container rebuild erased outputs/ + data/ again; this queue redoes
# the minimum prerequisite (full-field PI observer retrain — deterministic,
# ledgered 0.016331) and then spends the window in strict value order:
#   1. optimal-policy-observer drag row  (the item open since round 2)
#   2. optimal-observer drag row
#   3. wall-sized bf16 PINO pretrain at the reference budget (VERDICT 4)
#   4. extras: bench under kernel D, ddpg/observer retrains
# Every row banks partials per 250-step chunk (drag_study.py DRAG_DEADLINE)
# and every job is babysat against tunnel wedges (scripts/babysit.sh).
cd /root/repo || exit 1
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_tpu_cache}
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.3
export JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES=0
LOG=results/logs/drag_study_r5b.log
QLOG=results/logs/r5_queue6.log
log() { echo "[queue6 $(date +%H:%M:%S)] $*" >> "$QLOG"; }
round_end() { cat /root/repo/.round_end 2>/dev/null || date -d '+4 hours' +%s; }
CKPT=outputs/planes_channel180_minchan_fullfield-pi.msgpack

row() {  # row <name> <max_secs>  — deadline sized from when the row STARTS
  local NAME=$1 MAX=$2
  local NPZ=outputs/drag_study/$NAME.npz
  [ -f "$NPZ" ] && { log "row $NAME: cached"; return 0; }
  local NOW END DL
  NOW=$(date +%s); END=$(round_end)
  DL=$(( NOW + MAX ))
  [ "$DL" -gt $(( END - 300 )) ] && DL=$(( END - 300 ))
  if [ "$NOW" -ge "$DL" ]; then log "row $NAME: no window left"; return 1; fi
  log "row $NAME until $(date -d @"$DL" +%H:%M:%S)"
  bash scripts/babysit.sh "$LOG" 420 4 "[ -f $NPZ ]" -- \
    env "DRAG_ONLY=$NAME" "DRAG_DEADLINE=$DL" \
    timeout $(( DL - NOW + 300 )) python scripts/drag_study.py 50000
  log "row $NAME rc=$?"
  if [ ! -f "$NPZ" ] && [ -f "outputs/drag_study/$NAME.partial.npz" ]; then
    DRAG_PROMOTE=$NAME DRAG_ONLY=$NAME timeout 600 \
      python scripts/drag_study.py 50000 >> "$LOG" 2>&1
    log "row $NAME partial promoted rc=$?"
  fi
}

log "queue6 start; $(( $(round_end) - $(date +%s) ))s to round end"

# 0. wait for the full-field observer train AND eval (the ckpt lands
# before the eval; starting a row then would put two clients on the chip
# concurrently — the TPU worker has crashed under less)
ff_done() {
  [ -f "$CKPT" ] && grep -q 'Held-out' results/logs/fullfield_pi_r5b.log
}
for i in $(seq 1 90); do
  ff_done && break
  sleep 60
done
if ! ff_done; then
  log "fullfield ckpt still missing; training it from this queue"
  bash scripts/babysit.sh results/logs/fullfield_pi_r5b.log 480 4 \
    "[ -f $CKPT ]" -- \
    timeout 3600 python run_pde_observers.py --train_yaml configs/fullfield_pi.yaml
fi
[ -f "$CKPT" ] || { log "no fullfield ckpt; aborting"; exit 1; }
log "fullfield train+eval done"

# 1. cheap baseline rows (no dataset/ckpt needed; ~1 min each once compiled)
row unmanipulated 1800
row gt 1200
row rand 1200

# 2-3. the flagship gradient rows
row optimal-policy-observer 7200
row optimal-observer 4800

# 4. wall-sized bf16 PINO pretrain (VERDICT 4); resume-capable
NOW=$(date +%s); R=$(( $(round_end) - NOW ))
if [ "$R" -ge 1500 ] && [ ! -f outputs/pino-pretrain-bf16.msgpack ]; then
  ITERS=$(( (R - 900) * 1000 / 190 ))
  [ "$ITERS" -gt 20001 ] && ITERS=20001
  CFG=/tmp/pino_bf16_r5b.yaml
  sed -e "s/iterations: 20001/iterations: $ITERS/" \
      -e "s/save_interval: 2000/save_interval: 500/" \
      configs/pino-observer-pretrain-1s-bf16.yaml > "$CFG"
  BLOB=outputs/pino-pretrain-bf16.msgpack.resume.npy
  RESUME=""
  [ -f "$BLOB" ] && RESUME="--resume $BLOB"
  log "pino bf16: $ITERS iters $RESUME"
  bash scripts/babysit.sh results/logs/pino_pretrain_bf16_r5b.log 600 3 \
    "[ -f outputs/pino-pretrain-bf16.msgpack ]" -- \
    timeout $(( R - 420 )) python train_pino.py --config "$CFG" $RESUME
  log "pino rc=$?"
fi

# 5. extras, value order, only with leftover window
NOW=$(date +%s); R=$(( $(round_end) - NOW ))
if [ "$R" -ge 600 ] && [ ! -f results/logs/bench_r5_kernelD.txt ]; then
  log "bench under kernel D"
  timeout 480 python bench.py > results/logs/bench_r5_kernelD.txt 2>&1
  log "bench rc=$?"
fi
NOW=$(date +%s); R=$(( $(round_end) - NOW ))
if [ "$R" -ge 900 ] && [ ! -f outputs/ddpg_channel_actor.msgpack ]; then
  log "ddpg retrain"
  timeout $(( R - 300 )) python main_ddpg.py --channel \
    > results/logs/ddpg_channel_r5b.log 2>&1
  log "ddpg rc=$?"
  row ddpg 900
fi
log "queue6 done"
