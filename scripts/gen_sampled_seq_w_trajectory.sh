#!/usr/bin/env bash
# sample prior motions + predict their root trajectories
python -m hm_vae_tpu.cli.eval_trajectory --config configs/len64_no_aug_hm_vae.yaml \
  --trajectory_config configs/trajectory_model.yaml \
  --pred_trajectory_for_single_window "$@"
