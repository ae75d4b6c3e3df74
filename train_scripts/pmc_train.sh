#!/bin/bash
# PMC stage: VQ-VAE tracking policy, canonical hyperparameters
# (parity with the reference PMC recipe: lr 1e-5, gamma=lam=0.95, clip 0.1,
# z_len 32 / 256 codes, reward weights jp .3 jv .05 ee .1 rp .5 rv .05).
# The 4-terminal model_pool/league_mgr/learner/actor recipe collapses to one
# process: rollouts are on-device and the pool/league are in-process.
python -m lifelike_tpu.bin.run_learner \
  --task=pmc \
  --env_config="{ \
    'data_path': '/root/reference/data/mocap_data', \
    'control_freq': 50.0, 'kp': 50.0, 'kd': 0.5, 'max_tau': 18, \
    'reward_weights': {'joint_pos': 0.3, 'joint_vel': 0.05, \
                       'end_effector': 0.1, 'root_pose': 0.5, 'root_vel': 0.05}}" \
  --policy_config="{'z_len': 32, 'num_embeddings': 256, \
                    'bot_neck_z_embed_size': 32, 'bot_neck_prop_embed_size': 64}" \
  --learner_config="{'learning_rate': 1e-5, 'gamma': 0.95, 'lam': 0.95, \
                     'vf_coef': 1.0, 'ent_coef': 0.0, 'q_latent_coef': 1.0, \
                     'e_latent_coef': 0.25, 'rms_loss_coef': 1.0, \
                     'max_grad_norm': 0.5, 'unroll_length': 128}" \
  --num_envs=256 \
  --total_updates=100000 \
  --model_pool_dir=./pool_pmc \
  --checkpoint_dir=./ckpt_pmc \
  "$@"
