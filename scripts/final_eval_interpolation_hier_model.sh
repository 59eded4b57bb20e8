#!/usr/bin/env bash
# long-sequence temporal interpolation via latent optimization
python -m hm_vae_tpu.cli.eval_recovery --config configs/len_64_test_interpolation.yaml \
  --final_try_long_seq_interpolation \
  --trajectory_config configs/trajectory_model.yaml "$@"
