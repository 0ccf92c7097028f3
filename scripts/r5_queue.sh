#!/bin/bash
# Round-5 TPU job queue — serialized on the single chip (VERDICT r4 items
# 1, 2, 4 and the observer retrains the drag study depends on).
# Each job logs to results/logs/ and is skipped if its artifact exists, so
# the queue is resumable after a tunnel drop: just re-run this script.
cd /root/repo || exit 1
mkdir -p results/logs outputs
PY=python
log() { echo "[queue $(date +%H:%M:%S)] $*"; }

# 0. tunnel probe — refuse to start against a dead relay
if ! timeout 120 $PY -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))
" >/dev/null 2>&1; then
  log "tunnel dead; aborting queue run"; exit 2
fi
log "tunnel alive; starting queue"

# 1. full-field PI observer: train (100 ep) + held-out eval  [VERDICT 1a]
CKPT=outputs/planes_channel180_minchan_fullfield-pi.msgpack
if [ ! -f "$CKPT" ]; then
  log "job 1: fullfield_pi observer train+eval"
  timeout 5400 $PY run_pde_observers.py --train_yaml configs/fullfield_pi.yaml \
    > results/logs/fullfield_pi_r5.log 2>&1
  log "job 1 rc=$?"
elif ! grep -q "Held-out decoded data rel-L2" results/logs/fullfield_pi_r5.log 2>/dev/null; then
  log "job 1b: fullfield_pi eval_ckpt (train done, eval missing)"
  timeout 1800 $PY run_pde_observers.py --train_yaml configs/fullfield_pi.yaml \
    --eval_ckpt "$CKPT" >> results/logs/fullfield_pi_r5.log 2>&1
  log "job 1b rc=$?"
fi

# 2. OPO probe through stage 4 (payload-fix validation)  [VERDICT 1b]
if [ ! -f results/logs/opo_probe_r5.log ] || ! grep -q "stage 4 done" results/logs/opo_probe_r5.log; then
  log "job 2: opo_probe stage 4"
  timeout 3600 $PY scripts/opo_probe.py 4 > results/logs/opo_probe_r5.log 2>&1
  log "job 2 rc=$?"
fi

# 3-5. observer retrains (checkpoints lost in the container rebuild)
if [ ! -f outputs/planes_channel180_minchan_31-FNO-reproduce.msgpack ]; then
  log "job 3: FNO observer retrain"
  timeout 3600 $PY run_pde_observers.py --train_yaml configs/base_fno.yaml \
    > results/logs/fno_observer_r5.log 2>&1
  log "job 3 rc=$?"
fi
if [ ! -f outputs/planes_channel180_minchan_rno-observer.msgpack ]; then
  log "job 4: RNO observer retrain"
  timeout 1800 $PY run_pde_observers.py --train_yaml configs/matlab_rno.yaml \
    > results/logs/rno_observer_r5.log 2>&1
  log "job 4 rc=$?"
fi
if [ ! -f outputs/planes_channel180_minchan_6-Transformer-based.msgpack ]; then
  log "job 5: transformer observer retrain"
  timeout 5400 $PY run_pde_observers.py --train_yaml configs/base_transformer.yaml \
    > results/logs/transformer_observer_r5.log 2>&1
  log "job 5 rc=$?"
fi

# 6. DDPG on the channel DNS  [VERDICT 2]
if [ ! -f outputs/ddpg_channel_actor.msgpack ]; then
  log "job 6: DDPG channel training"
  timeout 5400 $PY main_ddpg.py --channel > results/logs/ddpg_channel_r5.log 2>&1
  log "job 6 rc=$?"
fi

# 7. drag study, 50k steps, all rows incl. OPO / optimal-observer / ddpg
#    (per-row npz cache makes re-runs cheap)  [VERDICT 1b, 2]
if [ ! -f outputs/drag_study/summary.json ]; then
  log "job 7: drag study 50k"
  timeout 21600 $PY scripts/drag_study.py 50000 > results/logs/drag_study_r5.log 2>&1
  log "job 7 rc=$?"
fi

# 8. bf16 PINO pretrain at the FULL reference budget  [VERDICT 4]
#    (kf_Re400.npy regenerates on first touch; ~2x faster iters than the
#    f32 round-4 run whose eval was 0.49542)
if [ ! -f outputs/pino-pretrain-bf16.msgpack ]; then
  log "job 8: bf16 PINO pretrain (20001 iters)"
  R=""
  [ -f outputs/pino-pretrain-bf16.msgpack.resume.npy ] && \
    R="--resume outputs/pino-pretrain-bf16.msgpack.resume.npy"
  timeout 14400 $PY train_pino.py --config configs/pino-observer-pretrain-1s-bf16.yaml $R \
    > results/logs/pino_pretrain_bf16.log 2>&1
  log "job 8 rc=$?"
fi

log "queue done"
