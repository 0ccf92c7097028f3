#!/bin/bash
# Round-5 TPU queue, part 2 — runs after r5_queue.sh's job 8 (bf16 PINO
# pretrain) frees the chip.  One process per gradient drag row so a worker
# crash cannot take down the siblings (the round-5 job-7 failure mode).
cd /root/repo || exit 1
log() { echo "[queue2 $(date +%H:%M:%S)] $*"; }

for row in optimal-policy-observer optimal-observer ddpg; do
  if [ ! -f "outputs/drag_study/$row.npz" ]; then
    log "drag row: $row"
    DRAG_ONLY=$row timeout 10800 python scripts/drag_study.py 50000 \
      >> results/logs/drag_study_r5.log 2>&1
    log "drag row $row rc=$?"
  fi
done
log "drag merge"
python scripts/drag_study.py 50000 >> results/logs/drag_study_r5.log 2>&1

if [ ! -f results/logs/fullstep_probe_r5.log ] || \
   ! grep -q "fullstep=True B= 32" results/logs/fullstep_probe_r5.log; then
  log "fullstep probe"
  timeout 7200 python scripts/fullstep_probe.py 3 \
    > results/logs/fullstep_probe_r5.log 2>&1
  log "fullstep probe rc=$?"
fi

if [ -f outputs/pino-pretrain-bf16.msgpack ] && \
   [ ! -f results/logs/tta_probe_r5.log ]; then
  log "TTA probe"
  timeout 7200 python scripts/tta_probe.py \
    outputs/pino-pretrain-bf16.msgpack 2000 \
    > results/logs/tta_probe_r5.log 2>&1
  log "TTA probe rc=$?"
fi
log "queue2 done"
