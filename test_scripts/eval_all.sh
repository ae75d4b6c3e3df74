#!/bin/bash
# Eval parity with the reference test_scripts: run each stage's env with a
# model (or random-init smoke) and print per-episode stats.
set -e
python -m lifelike_tpu.bin.run_eval --task=pmc --episodes=2 --max_steps=100 "$@"
python -m lifelike_tpu.bin.run_eval --task=epmc --episodes=1 --max_steps=50 \
  --env_config="{'env_randomize_config': {'element_id': 1}}" "$@"
python -m lifelike_tpu.bin.run_eval --task=sepmc --episodes=1 --max_steps=50 "$@"
python -m lifelike_tpu.bin.run_mpc --steps=20 --population=128 --horizon=8 "$@"
