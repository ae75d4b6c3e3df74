#!/bin/bash
# Reference test_scripts/primitive_level/test_primitive_level_env.py parity:
# PMC tracking eval, per-episode reward sum / length / running average.
python -m lifelike_tpu.bin.run_eval --task=pmc \
  --env_config="{'data_path': '/root/reference/data/mocap_data'}" "$@"
