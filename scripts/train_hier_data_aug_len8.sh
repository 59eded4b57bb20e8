#!/usr/bin/env bash
# len-8 model with fps + random-root-rotation augmentation
python -m hm_vae_tpu.cli.train --config configs/len8_data_aug_hm_vae.yaml "$@"
