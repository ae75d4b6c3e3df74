#!/bin/bash
# EPMC stage: terrain traversal over the frozen PMC LLC
# (parity with the reference EPMC recipe: element_id 0 joystick, friction
# 0.4-3.0, pushes 0-50 N horizontal, target speed 0.5-3.0, discrete z 256,
# hs 64*3). Seed the frozen LLC from a PMC model via --init_model.
python -m lifelike_tpu.bin.run_learner \
  --task=epmc \
  --env_config="{ \
    'control_freq': 50.0, 'kp': 50.0, 'kd': 1.0, 'max_tau': 16, \
    'env_randomize_config': { \
      'element_id': 0, \
      'friction_range': [0.4, 3.0], \
      'target_spd_range': [0.5, 3.0], \
      'cmd_vary_freq_range': [25, 200], \
      'disturb_force_config': {'start_time': 0.5, 'interval_time': 1.0, \
                               'duration_time': 0.2, \
                               'horizontal_force': [0, 50], \
                               'vertical_force': [0, 10]}}}" \
  --learner_config="{'learning_rate': 1e-5, 'gamma': 0.95, 'lam': 0.95, \
                     'unroll_length': 128}" \
  --num_envs=256 \
  --total_updates=100000 \
  --init_model=./pool_pmc/model_latest.model \
  --init_model_subtree="params/llc,params/prop_rms" \
  --model_pool_dir=./pool_epmc \
  --checkpoint_dir=./ckpt_epmc \
  "$@"
