#!/usr/bin/env bash
python -m hm_vae_tpu.cli.train --config configs/trajectory_model.yaml "$@"
