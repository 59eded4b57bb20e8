"""CLI integration tests: full train main + eval_recovery main on tiny configs."""

import json
import os

import numpy as np
import pytest


def test_train_cli_end_to_end(tmp_path):
    import yaml

    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "iteration_interval": 5,
        "max_iter": 12, "lr": 0.001, "batch_size": 4, "log_iter": 4,
        "validation_iter": 8, "snapshot_save_iter": 10,
        "image_save_iter": 10**9,
        "synthetic": True, "synthetic_num_seqs": 6,
        "data_root": str(tmp_path / "data"),
    }
    cfg_path = str(tmp_path / "smoke.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.train import main

    main(["--config", cfg_path, "--output_path", str(tmp_path)])
    run_dir = tmp_path / "outputs" / "smoke"
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "logs" / "metrics.jsonl").exists()
    ckpts = os.listdir(run_dir / "checkpoints")
    assert any(c.startswith("gen_") for c in ckpts), ckpts

    # resume path
    main(["--config", cfg_path, "--output_path", str(tmp_path), "--resume",
          "--max_iter", "14"])


def test_eval_recovery_cli(tmp_path):
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
        "opt_it": 6, "opt_lr": 0.1, "opt_step_size": 3,
        "interpolation_window": 3, "optimize_decoder": False,
        "replace_frame_with_gt": True,
    }
    cfg_path = str(tmp_path / "interp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path),
          "--final_try_long_seq_interpolation", "--max_seqs", "1"])
    out_dir = tmp_path / "eval_long_seq_interpolation" / "interp"
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["mpjpe"])
    rots = [f for f in os.listdir(out_dir) if f.endswith("_rot_opt_res.npy")]
    assert rots
