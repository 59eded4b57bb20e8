#!/usr/bin/env bash
# len-64 flagship hm-vae training (reference scripts/train_hier_no_aug_len64.sh)
python -m hm_vae_tpu.cli.train --config configs/len64_no_aug_hm_vae.yaml "$@"
