#!/bin/bash
# Reference test_scripts/strategic_level parity: two agents share one SEPMC
# model in the Chase Tag game; prints game info at episode end.
python -m lifelike_tpu.bin.run_eval --task=sepmc "$@"
