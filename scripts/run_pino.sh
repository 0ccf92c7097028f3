#!/bin/bash
# reference: scripts/run_pino.sh
python train_pino.py --config configs/pino-observer-pretrain-1s.yaml "$@"
