"""Evaluation CLI: motion completion / interpolation / generation.

Flag-compatible with ``eval_partial_motion_recovery.py:22-67``:
``--final_motion_completion_long_seq``, ``--final_try_long_seq_interpolation``,
``--try_final_long_seq_generation``, with ``--trajectory_config`` /
``--trajectory_test_model`` hooking in the root-trajectory model.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="Latent-optimization evaluations")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--trajectory_config", type=str, default="")
    p.add_argument("--trajectory_test_model", type=str, default="")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--max_seqs", type=int, default=4)
    p.add_argument("--gen_vis", action="store_true")
    p.add_argument("--input_gt", action="store_true")

    p.add_argument("--final_motion_completion_long_seq", action="store_true")
    p.add_argument("--final_try_long_seq_interpolation", action="store_true")
    p.add_argument("--try_final_long_seq_generation", action="store_true")
    args = p.parse_args(argv)

    import jax

    from ..apps.baselines import slerp_rotations
    from ..apps.metrics import accel_error, mpjpe
    from ..apps.tasks import LatentOptApps, interpolation_mask
    from ..data.dataset import EvalMotionDataset
    from ..models.trajectory import TrajectoryRunner
    from ..ops import fk as fk_mod
    from ..train.trainer import Trainer, build_trainer
    from ..utils.config import load_config
    from ..utils.viz import save_animation

    cfg = load_config(args.config)
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))

    model_name = os.path.splitext(os.path.basename(args.config))[0]
    if args.final_try_long_seq_interpolation:
        task, out_name = "interpolation", "eval_long_seq_interpolation"
    elif args.final_motion_completion_long_seq:
        task, out_name = "completion", "eval_long_seq_completion"
    elif args.try_final_long_seq_generation:
        task, out_name = "generation", "eval_long_seq_generation"
    else:
        p.error("choose one of the task flags")
    output_dir = os.path.join(args.output_path, out_name, model_name)
    os.makedirs(output_dir, exist_ok=True)

    trainer, _, _, test_ds = build_trainer(cfg, output_dir)
    if args.test_model:
        trainer.load_params(args.test_model)
    apps = LatentOptApps(trainer.model, trainer.state.params, cfg)

    traj_runner = None
    if args.trajectory_config:
        tcfg = load_config(args.trajectory_config)
        t_trainer = Trainer(tcfg, os.path.join(output_dir, "traj"),
                            mean_std=trainer.mean_std)
        if args.trajectory_test_model:
            t_trainer.load_params(args.trajectory_test_model)
        traj_runner = TrajectoryRunner(
            t_trainer.model, t_trainer.state.params,
            trainer.mean_std if trainer.mean_std is not None
            else np.stack([np.zeros(579), np.ones(579)]).astype(np.float32))

    # evaluation data: full test sequences
    eval_ds = EvalMotionDataset(
        os.path.join(cfg.data.data_root, "seqs"),
        os.path.join(cfg.data.data_root, "test.json"))

    rng = jax.random.PRNGKey(cfg.run.seed)
    W = cfg.model.train_seq_len
    results = []
    for i in range(min(args.max_seqs, len(eval_ds))):
        item = eval_ds[i]
        rotmat = item["rot_mat"]
        if rotmat.shape[0] < W:
            continue
        key = jax.random.fold_in(rng, i)
        if task == "interpolation":
            out = apps.interpolate(rotmat, key)
            T_out = out["pose"].shape[0]
            gt_pose = fk_mod.fk_numpy(rotmat[:T_out])
            tmask = interpolation_mask(W, cfg.latent_opt.interpolation_window)
            slerp = slerp_rotations(
                rotmat[:T_out].reshape(-1, W, 24, 3, 3)[0], tmask) \
                if T_out == W else None
            m = {
                "mpjpe": float(mpjpe(out["pose"], gt_pose)),
                "accel_err": float(accel_error(out["pose"], gt_pose)),
            }
        elif task == "completion":
            missing = ("upper" if cfg.latent_opt.missing_upper_completion
                       else "lower")
            out = apps.complete(rotmat, key, missing=missing)
            T_out = out["pose"].shape[0]
            gt_pose = fk_mod.fk_numpy(rotmat[:T_out])
            m = {
                "mpjpe": float(mpjpe(out["pose"], gt_pose)),
                "accel_err": float(accel_error(out["pose"], gt_pose)),
            }
        else:  # generation
            out = apps.generate(rotmat[:W], key, num_windows=5, overlap=10)
            m = {"length": out["pose"].shape[0]}

        name = item["name"].replace(".npy", "")
        np.save(os.path.join(output_dir, f"{name}_rot_opt_res.npy"),
                np.asarray(out["rot_mat"]))
        if traj_runner is not None:
            world, root_v = traj_runner(out["rot_6d"][None])
            np.save(os.path.join(output_dir, f"{name}_root_trans_opt_res.npy"),
                    np.asarray(world[0]))
            if args.gen_vis:
                save_animation(np.asarray(world[0])[None],
                               os.path.join(output_dir, f"{name}.mp4"))
        elif args.gen_vis:
            save_animation(np.asarray(out["pose"])[None],
                           os.path.join(output_dir, f"{name}.mp4"))
        results.append((name, m))
        print(name, m, flush=True)

    if results:
        keys = results[0][1].keys()
        summary = {k: float(np.mean([m[k] for _, m in results])) for k in keys}
        print("summary:", summary)
        import json

        with open(os.path.join(output_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
