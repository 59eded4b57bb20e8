#!/usr/bin/env bash
# refine VIBE estimates with the motion prior (pass --vibe_output <pkl|npy>)
python -m hm_vae_tpu.cli.refine_vibe --config configs/len64_no_aug_hm_vae.yaml "$@"
