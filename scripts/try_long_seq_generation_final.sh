#!/usr/bin/env bash
# autoregressive long-sequence generation via latent optimization
python -m hm_vae_tpu.cli.eval_recovery --config configs/len_64_test_interpolation.yaml \
  --try_final_long_seq_generation \
  --trajectory_config configs/trajectory_model.yaml "$@"
