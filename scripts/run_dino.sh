#!/bin/bash
# reference: scripts/run_dino.sh
python train_dino.py -d navier -r 1.0 "$@"
