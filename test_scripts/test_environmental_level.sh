#!/bin/bash
# Reference test_scripts/environmental_level parity: pick the course with
# element_id (1 hurdles, 2 holes, 3 cubes, 0 joystick).
python -m lifelike_tpu.bin.run_eval --task=epmc \
  --env_config="{'env_randomize_config': {'element_id': 1}}" "$@"
