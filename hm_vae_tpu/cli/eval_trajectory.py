"""Trajectory-model evaluation CLI.

Flag-compatible with ``eval_trajectory_pred.py:31-74``:
``--pred_trajectory_for_single_window`` (prior samples -> trajectory),
``--seq_generation_npy_path/--seq_generation_npy_folder`` (trajectory for
saved rotation npys), ``--debug_trajectory`` (GT windows through the model).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Trajectory prediction evaluation")
    p.add_argument("--config", type=str, required=True,
                   help="VAE config (for sampling)")
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--trajectory_config", type=str, required=True)
    p.add_argument("--trajectory_test_model", type=str, default="")
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--gen_vis", action="store_true")
    # literal reference flags (eval_trajectory_pred.py:44-61):
    # --vis_iters x --vis_bs bounds the sampled sequences (--num_samples
    # wins if given), --out_tag suffixes the output directory name
    p.add_argument("--vis_iters", type=int, default=None)
    p.add_argument("--vis_bs", type=int, default=None)
    p.add_argument("--out_tag", type=str, default="")

    p.add_argument("--pred_trajectory_for_single_window", action="store_true")
    p.add_argument("--seq_generation_npy_path", type=str, default="")
    p.add_argument("--seq_generation_npy_folder", type=str, default="")
    p.add_argument("--debug_trajectory", action="store_true")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="shard the trajectory model's time axis over N "
                        "devices (halo-exchange sequence parallelism); "
                        "removes the single-device length limit")
    p.add_argument("--sequence_parallel_strict", action="store_true",
                   help="demand T %% N == 0 instead of pad-and-trim: the "
                        "padded tail's conv context repeats the last frame, "
                        "so the final few velocities are not bit-comparable "
                        "to an unsharded run; strict mode errors instead")
    args = p.parse_args(argv)

    import jax

    from ..apps.inference import VAEInference
    from ..models.trajectory import TrajectoryRunner
    from ..ops import rotations as rot
    from ..train.trainer import Trainer, build_trainer
    from ..utils.config import load_config
    from ..utils.viz import save_animation

    cfg = load_config(args.config)
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))
    if args.num_samples is None:
        args.num_samples = (args.vis_iters * (args.vis_bs or 32)
                            if args.vis_iters is not None else 16)
    model_name = os.path.splitext(os.path.basename(args.config))[0]
    if args.out_tag:
        model_name = f"{model_name}_{args.out_tag}"
    output_dir = os.path.join(args.output_path, "eval_trajectory", model_name)
    os.makedirs(output_dir, exist_ok=True)

    trainer, _, _, test_ds = build_trainer(cfg, output_dir)
    if args.test_model:
        trainer.load_params(args.test_model)

    tcfg = load_config(args.trajectory_config)
    t_trainer = Trainer(tcfg, os.path.join(output_dir, "traj"),
                        mean_std=trainer.mean_std)
    if args.trajectory_test_model:
        t_trainer.load_params(args.trajectory_test_model)
    sp_mesh = None
    if args.sequence_parallel > 1:
        from ..parallel import sharding as sh

        sp_mesh = sh.make_mesh(args.sequence_parallel, model_parallel=1)
    runner = TrajectoryRunner(
        t_trainer.model, t_trainer.state.params, trainer.mean_std,
        sp_mesh=sp_mesh,
        sp_pad_incomplete=not args.sequence_parallel_strict)

    def run_and_save(rot6d, tag):
        world, root_v = runner(rot6d)
        # multi-host: every process dispatched the compute above together;
        # the shared-fs artifacts get ONE writer (same policy as
        # eval_recovery._save_seq_outputs / _write_summary)
        from ..parallel.multihost import is_primary

        if not is_primary():
            return world
        for b in range(world.shape[0]):
            # (T, 24, 9) = 6D rep ++ world positions (eval_trajectory_pred.py
            # saves the same concat layout)
            out = np.concatenate(
                [np.asarray(rot6d[b]), np.asarray(world[b])], axis=-1)
            np.save(os.path.join(output_dir, f"{tag}_{b}.npy"), out)
            np.save(os.path.join(output_dir, f"{tag}_{b}_trans.npy"),
                    np.asarray(world[b][:, 0, :]))
            if args.gen_vis:
                save_animation(np.asarray(world[b])[None],
                               os.path.join(output_dir, f"{tag}_{b}.mp4"))
        return world

    if args.pred_trajectory_for_single_window:
        infer = VAEInference(trainer.model, trainer.state.params, cfg)
        out6d, _, _ = infer.prior_samples(
            jax.random.PRNGKey(cfg.run.seed), args.num_samples)
        clean = infer.clean_6d(out6d)
        run_and_save(clean, "sampled_single_window")

    npys = []
    if args.seq_generation_npy_path:
        npys = [args.seq_generation_npy_path]
    elif args.seq_generation_npy_folder:
        npys = [os.path.join(args.seq_generation_npy_folder, f)
                for f in sorted(os.listdir(args.seq_generation_npy_folder))
                if f.endswith(".npy")]
    for path in npys:
        mats = np.load(path)  # (T, 24, 3, 3)
        six = np.asarray(rot.rotmat_to_rot6d(mats))
        run_and_save(six[None],
                     os.path.splitext(os.path.basename(path))[0] + "_traj")

    if args.debug_trajectory:
        # run GT windows through the trajectory model
        b = test_ds.sample_batch(min(4, cfg.optim.batch_size))
        world = run_and_save(b["rot_6d"], "debug_gt_window")
        print("debug trajectory shapes:", world.shape)


if __name__ == "__main__":
    main()
