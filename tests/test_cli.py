"""CLI integration tests: full train main + eval_recovery main on tiny configs."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
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


def test_all_shipped_configs_load_and_build():
    """Every configs/*.yaml must parse into a buildable model config."""
    import glob
    from hm_vae_tpu.models.hm_vae import HMVAE
    from hm_vae_tpu.models.structure import get_structure, get_trajectory_structure
    from hm_vae_tpu.utils.config import load_config

    paths = sorted(glob.glob("configs/*.yaml"))
    assert len(paths) >= 5
    for p in paths:
        cfg = load_config(p)
        if cfg.model.model_name == "TrajectoryModel":
            st = get_trajectory_structure(cfg.model)
            assert st.out_edges == 7
        else:
            st = get_structure(cfg.model)
            assert st.cascade.edge_num[:4] == [24, 14, 9, 7]


def test_all_reference_configs_load_verbatim():
    """The reference repo's own four shipped YAMLs (train len-64/len-8,
    trajectory, interpolation-eval) must load unmodified through the typed
    schema with their key fields landing in the right place
    (/root/reference/configs/*.yaml)."""
    import glob
    import os

    from hm_vae_tpu.utils.config import load_config

    ref_dir = "/root/reference/configs"
    if not os.path.isdir(ref_dir):
        import pytest
        pytest.skip("reference checkout not present")
    paths = sorted(glob.glob(os.path.join(ref_dir, "*.yaml")))
    assert len(paths) == 4
    by_name = {os.path.basename(p): load_config(p) for p in paths}

    c64 = by_name["len64_no_aug_hm_vae.yaml"]
    assert (c64.model.train_seq_len, c64.model.kernel_size) == (64, 15)
    assert not c64.data.random_root_rot_flag and not c64.data.fps_aug_flag

    c8 = by_name["len8_data_aug_hm_vae.yaml"]
    assert c8.model.train_seq_len == 8
    assert c8.data.random_root_rot_flag and c8.data.fps_aug_flag

    ct = by_name["trajectory_model.yaml"]
    assert ct.model.model_name == "TrajectoryModel"

    ci = by_name["len_64_test_interpolation.yaml"]
    assert (ci.latent_opt.opt_it, ci.latent_opt.opt_lr) == (150, 0.1)
    assert ci.latent_opt.optimize_decoder
    assert ci.latent_opt.interpolation_window == 5
    assert ci.latent_opt.replace_frame_with_gt


def test_reference_style_flat_yaml_loads(tmp_path):
    """A reference-format config (flat keys incl. unknown ones) must load."""
    import yaml
    from hm_vae_tpu.utils.config import load_config

    flat = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 24,
        "shallow_latent_d": 12, "kernel_size": 15, "train_seq_len": 64,
        "batch_size": 8, "lr": 0.0001, "step_size": 100000, "gamma": 0.3,
        "lr_policy": "step", "kl_w": 0.003, "iteration_interval": 50000,
        # keys the reference ships but never reads (SURVEY §5.6)
        "hier_use_add": False, "fade_in_duration": 40000, "pre_kl_w": 0.0003,
        "use_shallow_model": True, "image_display_iter": 5000,
    }
    p = str(tmp_path / "ref.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(flat, f)
    cfg = load_config(p)
    assert cfg.model.latent_d == 24
    assert cfg.optim.step_size == 100000
    assert cfg.loss.iteration_interval == 50000


def test_eval_trajectory_cli(tmp_path):
    import yaml

    data_root = str(tmp_path / "data")
    vae_cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
    }
    traj_cfg = {
        "model_name": "TrajectoryModel", "latent_d": 12, "kernel_size": 3,
        "train_seq_len": 8, "batch_size": 4, "trajectory_input_joint_pos": True,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
    }
    vp, tp = str(tmp_path / "vae.yaml"), str(tmp_path / "traj.yaml")
    for p, c in ((vp, vae_cfg), (tp, traj_cfg)):
        with open(p, "w") as f:
            yaml.safe_dump(c, f)

    from hm_vae_tpu.cli.eval_trajectory import main

    main(["--config", vp, "--trajectory_config", tp,
          "--output_path", str(tmp_path), "--num_samples", "2",
          "--pred_trajectory_for_single_window"])
    out_dir = tmp_path / "eval_trajectory" / "vae"
    files = os.listdir(out_dir)
    assert any(f.startswith("sampled_single_window") and f.endswith(".npy")
               for f in files), files
    arr = np.load(out_dir / "sampled_single_window_0.npy")
    assert arr.shape[-1] == 9  # 6D ++ world positions

    # --sequence_parallel: same eval with the trajectory model's time axis
    # sharded over 2 devices (halo exchange + pad-and-trim; T=8 windows ->
    # T_local=4 > halo 1 for kernel 3)
    sp_out = str(tmp_path / "sp")
    main(["--config", vp, "--trajectory_config", tp,
          "--output_path", sp_out, "--num_samples", "2",
          "--pred_trajectory_for_single_window", "--sequence_parallel", "2"])
    arr_sp = np.load(os.path.join(sp_out, "eval_trajectory", "vae",
                                  "sampled_single_window_0.npy"))
    # same seed + divisible T -> the sharded run reproduces the unsharded one
    np.testing.assert_allclose(arr_sp, arr, rtol=2e-4, atol=2e-5)

    # --sequence_parallel_strict: T=8 divides 2 shards, so strict mode runs
    # and reproduces the same output (non-divisible T raises instead of
    # silently pad-and-trimming; see test_sequence_parallel.py)
    st_out = str(tmp_path / "strict")
    main(["--config", vp, "--trajectory_config", tp,
          "--output_path", st_out, "--num_samples", "2",
          "--pred_trajectory_for_single_window", "--sequence_parallel", "2",
          "--sequence_parallel_strict"])
    arr_st = np.load(os.path.join(st_out, "eval_trajectory", "vae",
                                  "sampled_single_window_0.npy"))
    np.testing.assert_allclose(arr_st, arr, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_eval_completion_single_window_cli(tmp_path):
    """--final_motion_completion: the intended single-window API with random
    per-frame joint masks (eval_partial_motion_recovery.py:60-61, 117-127),
    batched across sequences, evaluated over the full test split."""
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
        "opt_it": 6, "opt_lr": 0.1, "opt_step_size": 3,
        "optimize_decoder": False, "replace_part_with_gt": True,
    }
    cfg_path = str(tmp_path / "comp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path),
          "--final_motion_completion", "--missing_joint_prob", "0.4",
          "--chunk", "4"])
    out_dir = tmp_path / "eval_completion_single_window" / "comp"
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["mpjpe"])
    assert np.isfinite(summary["mpjpe_missing"])
    # full test split by default (synthetic split has >1 test sequence)
    assert summary["num_seqs"] >= 1
    rots = [f for f in os.listdir(out_dir) if f.endswith("_rot_opt_res.npy")]
    assert len(rots) == summary["num_seqs"]


@pytest.mark.slow
def test_eval_interpolation_single_window_cli(tmp_path):
    """--try_interpolation_w_trajectory_single_window: the intended
    single-window interpolation API (eval_partial_motion_recovery.py:96-103)
    with the keyframe trajectory loss in the solver."""
    import yaml

    data_root = str(tmp_path / "data")
    vae_cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
        "opt_it": 6, "opt_lr": 0.1, "opt_step_size": 3,
        "interpolation_window": 3, "optimize_decoder": False,
        "replace_frame_with_gt": True,
    }
    traj_cfg = {
        "model_name": "TrajectoryModel", "latent_d": 12, "kernel_size": 3,
        "train_seq_len": 8, "batch_size": 4, "trajectory_input_joint_pos": True,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
    }
    vp, tp = str(tmp_path / "vae.yaml"), str(tmp_path / "traj.yaml")
    for p, c in ((vp, vae_cfg), (tp, traj_cfg)):
        with open(p, "w") as f:
            yaml.safe_dump(c, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", vp, "--trajectory_config", tp,
          "--output_path", str(tmp_path),
          "--try_interpolation_w_trajectory_single_window", "--chunk", "4"])
    out_dir = (tmp_path / "eval_interpolation_w_trajectory_single_window"
               / "vae")
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["mpjpe"])
    # trajectory model present -> world-space trajectories saved per sequence
    trans = [f for f in os.listdir(out_dir)
             if f.endswith("_root_trans_opt_res.npy")]
    assert len(trans) == summary["num_seqs"]

    # without a trajectory model the flag must error out loudly rather than
    # silently running plain interpolation into the *_w_trajectory dir
    import pytest
    with pytest.raises(SystemExit):
        main(["--config", vp, "--output_path", str(tmp_path),
              "--try_interpolation_w_trajectory_single_window"])


@pytest.mark.slow
def test_eval_completion_long_seq_cli_batched(tmp_path):
    """--final_motion_completion_long_seq over the full test split: the
    batched-across-sequences completion path (apps.complete_many)."""
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
        "opt_it": 6, "opt_lr": 0.1, "opt_step_size": 3,
        "optimize_decoder": False, "replace_part_with_gt": True,
        "missing_lower_completion": True,
    }
    cfg_path = str(tmp_path / "comp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path),
          "--final_motion_completion_long_seq", "--chunk", "4"])
    out_dir = tmp_path / "eval_long_seq_completion" / "comp"
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    assert np.isfinite(summary["mpjpe"])
    rots = [f for f in os.listdir(out_dir) if f.endswith("_rot_opt_res.npy")]
    assert len(rots) == summary["num_seqs"] >= 1
    # stitched output spans all full windows of each sequence
    import glob
    arr = np.load(sorted(glob.glob(str(out_dir / "*_rot_opt_res.npy")))[0])
    assert arr.ndim == 4 and arr.shape[1:] == (24, 3, 3)
    assert arr.shape[0] >= 8


def test_pad_chunk_policy():
    """First chunk solves at its exact size (small runs pay no padding);
    later (tail) chunks pad to the full chunk width to reuse the compile."""
    from hm_vae_tpu.cli.eval_recovery import _pad_chunk

    assert _pad_chunk([1, 2], 4, 0) == ([1, 2], 2)
    assert _pad_chunk([1, 2], 4, 1) == ([1, 2, 2, 2], 2)
    assert _pad_chunk([1, 2, 3, 4], 4, 2) == ([1, 2, 3, 4], 4)


def test_eval_reconstruction_cli(tmp_path):
    """--test_model_rec: the reference's intended test-set reconstruction
    surface (trainer_motion_vae.py:160-161) — posterior-mean encode/decode
    over every non-overlapping window of the test split, MPJPE / PA-MPJPE /
    accel metrics, no latent optimization."""
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
    }
    cfg_path = str(tmp_path / "rec.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path),
          "--test_model_rec", "--chunk", "4"])
    out_dir = tmp_path / "eval_reconstruction" / "rec"
    with open(out_dir / "summary.json") as f:
        summary = json.load(f)
    for k in ("mpjpe", "pa_mpjpe", "accel_err"):
        assert np.isfinite(summary[k]), k
    # PA alignment can only reduce the error
    assert summary["pa_mpjpe"] <= summary["mpjpe"] + 1e-6
    assert summary["num_seqs"] >= 1
    rots = [f for f in os.listdir(out_dir) if f.endswith("_rot_opt_res.npy")]
    assert len(rots) == summary["num_seqs"]
    # reconstructed sequences are whole-window multiples of train_seq_len
    arr = np.load(os.path.join(out_dir, rots[0]))
    assert arr.shape[1:] == (24, 3, 3) and arr.shape[0] % 8 == 0

    # --data_parallel 8: pure batched encode/decode shards over the virtual
    # mesh's data axis; no optimizer loop, so metrics match tightly
    main(["--config", cfg_path, "--output_path", str(tmp_path / "dp"),
          "--test_model_rec", "--chunk", "4", "--data_parallel", "8"])
    with open(tmp_path / "dp" / "eval_reconstruction" / "rec" /
              "summary.json") as f:
        s_dp = json.load(f)
    for k in ("mpjpe", "pa_mpjpe", "accel_err"):
        np.testing.assert_allclose(s_dp[k], summary[k], rtol=1e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_eval_recovery_cli_data_parallel_matches_single(tmp_path):
    """--data_parallel 8 on the virtual CPU mesh: the eval CLI's summary
    metrics match the single-device run (windows are independent solves; the
    low opt_it keeps chaotic amplification of per-shard codegen noise below
    measurement precision — see test_latent_opt.py's sharded-solve test)."""
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
        "opt_it": 4, "opt_lr": 0.1, "opt_step_size": 2, "prev_epochs": 2,
        "interpolation_window": 3, "optimize_decoder": True,
        "replace_frame_with_gt": True,
    }
    cfg_path = str(tmp_path / "interp.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from hm_vae_tpu.cli.eval_recovery import main

    main(["--config", cfg_path, "--output_path", str(tmp_path / "single"),
          "--final_try_long_seq_interpolation", "--max_seqs", "2",
          "--batch_across_seqs"])
    main(["--config", cfg_path, "--output_path", str(tmp_path / "dp"),
          "--final_try_long_seq_interpolation", "--max_seqs", "2",
          "--batch_across_seqs", "--data_parallel", "8"])

    def summary(d):
        with open(tmp_path / d / "eval_long_seq_interpolation" / "interp" /
                  "summary.json") as f:
            return json.load(f)

    s1, s2 = summary("single"), summary("dp")
    assert set(s1) == set(s2)
    for k in s1:
        np.testing.assert_allclose(s2[k], s1[k], rtol=1e-3, atol=1e-6,
                                   err_msg=k)


def test_flat_lora_rank_routes_to_latent_opt_only(tmp_path):
    """A flat `lora_rank:` is a solver knob: it must set
    latent_opt.lora_rank and must NOT leak into ModelConfig (which would add
    adapter params to the TRAINING model); nested model.lora_rank is still
    settable explicitly (utils/config.py _FLAT_EXCLUDES)."""
    from hm_vae_tpu.utils.config import load_config

    f = tmp_path / "flat.yaml"
    f.write_text("lora_rank: 8\nfinetune_scope: lora\n")
    cfg = load_config(str(f))
    assert cfg.latent_opt.lora_rank == 8
    assert cfg.latent_opt.finetune_scope == "lora"
    assert cfg.model.lora_rank == 0

    g = tmp_path / "nested.yaml"
    g.write_text("model:\n  lora_rank: 3\nlatent_opt:\n  lora_rank: 8\n")
    cfg = load_config(str(g))
    assert cfg.model.lora_rank == 3
    assert cfg.latent_opt.lora_rank == 8
