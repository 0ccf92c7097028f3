#!/bin/bash
# Round-5 TPU queue, part 4 — opportunistic use of whatever chip window
# remains after queue3 (the flagship OPO/OO drag rows) finishes:
#   1. one bench.py run under the new kernel-D default (tracked number for
#      the README; the driver's BENCH_r05 is the number of record)
#   2. the bf16 PINO pretrain (VERDICT item 4), iteration budget computed
#      from the remaining wall so the run COMPLETES (final eval included)
#      instead of dying at the timeout; save_interval 500 so a wedge can
#      resume.  Caps at the full 20001-iter reference budget.
# Launch detached: setsid bash scripts/r5_queue4.sh &
cd /root/repo || exit 1
QLOG=results/logs/r5_queue4.log
LOG=results/logs/pino_pretrain_bf16_r5.log
log() { echo "[queue4 $(date +%H:%M:%S)] $*" >> "$QLOG"; }
round_end() { cat /root/repo/.round_end 2>/dev/null || date -d '12:05' +%s; }

probe() {
  timeout 90 python - >/dev/null 2>&1 <<'EOF'
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256, 256)))))
EOF
}

log "queue4 start; waiting for queue3"
until grep -q "queue3 done" results/logs/r5_queue3.log 2>/dev/null; do
  sleep 60
done
REM=$(( $(round_end) - $(date +%s) ))
log "queue3 done; remaining ${REM}s"
[ "$REM" -lt 600 ] && { log "no window"; exit 0; }

until probe; do log "tunnel dead; waiting"; sleep 120; done

# 1. bench under kernel-D default (~2.5 min)
if [ ! -f results/logs/bench_r5_kernelD.txt ]; then
  log "bench under kernel D"
  timeout 600 python bench.py > results/logs/bench_r5_kernelD.txt 2>&1
  log "bench rc=$?"
fi

# 2. bf16 PINO pretrain sized to the remaining wall (190 ms/iter measured
#    at the full 128x128x65 w64 b4(accum) budget, pino_pretrain_bf16.log)
REM=$(( $(round_end) - $(date +%s) ))
[ "$REM" -lt 900 ] && { log "no pino window"; exit 0; }
ITERS=$(( (REM - 600) * 1000 / 190 ))
[ "$ITERS" -gt 20001 ] && ITERS=20001
CFG=/tmp/pino_bf16_r5.yaml
sed -e "s/iterations: 20001/iterations: $ITERS/" \
    -e "s/save_interval: 2000/save_interval: 500/" \
    configs/pino-observer-pretrain-1s-bf16.yaml > "$CFG"
RESUME=""
BLOB=outputs/pino-pretrain-bf16.msgpack.resume.npy
[ -f "$BLOB" ] && RESUME="--resume $BLOB"
log "bf16 pretrain: $ITERS iters $RESUME"
timeout $(( REM - 180 )) python train_pino.py --config "$CFG" $RESUME \
  >> "$LOG" 2>&1
log "pino rc=$?"
log "queue4 done"
