"""Latent-space exploration CLI.

``python -m hm_vae_tpu.cli.explore_latent --config <yaml> [--test_model ckpt]
--check_hier_latent_space | --vis_given_z_vec z.npz [--gen_vis]``

Implements the reference's *intended* inspection surface — its Trainer
delegates ``check_hier_latent_space`` / ``vis_given_z_vec``
(``trainer_motion_vae.py:151-152, 187-188``) to methods the released model
never defines.  ``--check_hier_latent_space`` runs three probes on the test
split (per-level prior sweeps, level swaps between two motions, latent-space
interpolation) and writes pose npys + an index json;
``--vis_given_z_vec`` decodes a saved ``np.savez`` z-list (keys ``z0..zN`` or
positional arrays) to motion.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Hierarchical latent exploration")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=4,
                   help="prior samples per level in the sweep")
    p.add_argument("--num_lerp", type=int, default=5,
                   help="interpolation points between the two motions")
    p.add_argument("--gen_vis", action="store_true")
    p.add_argument("--check_hier_latent_space", action="store_true")
    p.add_argument("--vis_given_z_vec", type=str, default="",
                   help="path to an .npz of z arrays to decode")
    args = p.parse_args(argv)
    if not (args.check_hier_latent_space or args.vis_given_z_vec):
        p.error("choose --check_hier_latent_space and/or --vis_given_z_vec")

    import jax

    from ..apps import latent_space as ls
    from ..apps.inference import VAEInference
    from ..data.dataset import EvalMotionDataset
    from ..ops import rotations as rot
    from ..train.trainer import build_trainer
    from ..utils.config import load_config

    cfg = load_config(args.config)
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))

    model_name = os.path.splitext(os.path.basename(args.config))[0]
    output_dir = os.path.join(args.output_path, "latent_space", model_name)
    os.makedirs(output_dir, exist_ok=True)

    trainer, _, _, _ = build_trainer(cfg, output_dir)
    if args.test_model:
        trainer.load_params(args.test_model)
    infer = VAEInference(trainer.model, trainer.state.params, cfg)
    index = {}

    def emit(name, out):
        six, rm, pose = out
        np.save(os.path.join(output_dir, f"{name}_pose.npy"),
                np.asarray(pose))
        np.save(os.path.join(output_dir, f"{name}_rot.npy"), np.asarray(rm))
        index[name] = list(np.asarray(pose).shape)
        if args.gen_vis:
            from ..utils.viz import save_animation

            save_animation(np.asarray(pose)[:1],
                           os.path.join(output_dir, f"{name}.mp4"))

    if args.vis_given_z_vec:
        with np.load(args.vis_given_z_vec) as zf:
            keys = sorted(zf.files)
            zs = [zf[k] for k in keys]
        emit("given_z", ls.decode_given_z(infer, zs))

    if args.check_hier_latent_space:
        key = jax.random.PRNGKey(cfg.run.seed)
        for name, out in ls.level_sweep(infer, key,
                                        batch=args.num_samples).items():
            emit(f"sweep_{name}", out)

        # two test motions for swap + lerp probes
        W = cfg.model.train_seq_len
        from ..data.dataset import resolve_split_json

        ds = EvalMotionDataset(os.path.join(cfg.data.data_root, "seqs"),
                               resolve_split_json(cfg, "test"))
        # prefer windows from two different sequences; with a single eligible
        # test sequence fall back to two non-overlapping windows of it
        picks, fallback = [], None
        for i in range(len(ds)):
            it = ds[i]
            if it["rot_mat"].shape[0] >= W:
                picks.append(it["rot_mat"][:W])
                if len(picks) == 1 and it["rot_mat"].shape[0] >= 2 * W:
                    fallback = it["rot_mat"][W:2 * W]
            if len(picks) == 2:
                break
        if len(picks) == 1 and fallback is not None:
            picks.append(fallback)
        if len(picks) == 2:
            import jax.numpy as jnp

            a6 = rot.rotmat_to_rot6d(jnp.asarray(picks[0])[None])
            b6 = rot.rotmat_to_rot6d(jnp.asarray(picks[1])[None])
            nl = cfg.model.num_layers
            emit("swap_shallow_from_b", ls.level_swap(infer, a6, b6, 0))
            emit("swap_deep_from_b", ls.level_swap(infer, a6, b6, nl - 1))
            for i, out in enumerate(
                    ls.latent_lerp(infer, a6, b6, num=args.num_lerp)):
                emit(f"lerp_{i}", out)
        else:
            print("fewer than two window-length test sequences; "
                  "skipped swap/lerp probes")

    with open(os.path.join(output_dir, "index.json"), "w") as f:
        json.dump(index, f, indent=2)
    print("wrote", len(index), "probes to", output_dir)


if __name__ == "__main__":
    main()
