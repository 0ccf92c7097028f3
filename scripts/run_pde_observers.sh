#!/bin/bash
# reference: scripts/run_pde_observers.sh
python run_pde_observers.py --train_yaml configs/base_fno.yaml "$@"
