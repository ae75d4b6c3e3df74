#!/bin/bash
# SEPMC stage: Chase Tag self-play over frozen MLC+LLC
# (parity with the reference SEPMC recipe, example_sepmc_train.sh: PFSP
# game manager over frozen historical models, hs 64*4, unroll 128, episode
# cap 1000 steps = 20 s, friction/push/speed randomization; seeds the frozen
# MLC+LLC subtrees from an EPMC-stage model via --init_model).
# The reference's 4-process model_pool/league_mgr/learner/actor recipe
# collapses to one process: rollouts are on-device, the pool/league are
# in-process, and PFSP opponents are parameter snapshots.
python -m lifelike_tpu.bin.run_learner \
  --task=sepmc \
  --env_config="{ \
    'control_freq': 50.0, 'kp': 50.0, 'kd': 1.0, 'max_tau': 16, \
    'max_steps': 1000, \
    'env_randomize_config': { \
      'friction_range': [0.4, 3.0], \
      'control_spd_range': [1.0, 3.0], \
      'disturb_force_config': {'start_time': 0.5, 'interval_time': 1.0, \
                               'duration_time': 0.2, \
                               'horizontal_force': [0, 50], \
                               'vertical_force': [0, 10]}}}" \
  --learner_config="{'learning_rate': 1e-5, 'gamma': 0.95, 'lam': 0.95, \
                     'unroll_length': 128}" \
  --init_model=./pool_epmc/model_final.npz \
  --init_model_subtree="params/llc,params/mlc_prop_embed,params/mlc_cmd,params/mlc_fc,params/mlc_lstm" \
  --update_opponent_freq=20 \
  --num_envs=64 \
  --total_updates=100000 \
  --model_pool_dir=./pool_sepmc \
  --checkpoint_dir=./ckpt_sepmc \
  "$@"
