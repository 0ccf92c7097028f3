#!/bin/bash
python run_control.py --control_yaml configs/base_control.yaml "$@"
