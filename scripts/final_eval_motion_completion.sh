#!/usr/bin/env bash
# long-sequence body-part completion via latent optimization
python -m hm_vae_tpu.cli.eval_recovery --config configs/len_64_test_interpolation.yaml \
  --final_motion_completion_long_seq \
  --trajectory_config configs/trajectory_model.yaml "$@"
