"""Export trained models as self-contained StableHLO serving bundles.

The reference has no deployment path (serving its checkpoints requires the
whole PyTorch codebase on the serving host).  This CLI turns an orbax (or
imported torch) checkpoint into a directory of ``jax.export`` artifacts —
posterior-mean reconstruction, encoder, decoder, and optionally the
root-trajectory predictor — loadable with ``apps.export.load_exported`` in a
process that has jax only.  See ``hm_vae_tpu/apps/export.py``.

Example:
    python -m hm_vae_tpu.cli.export_model --config configs/len64.yaml \
        --test_model outputs/run/checkpoints/gen_000250000 \
        --trajectory_config configs/trajectory_model.yaml \
        --trajectory_test_model outputs/traj/checkpoints/gen_000200000 \
        --out exported/
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(
        description="Export a serving bundle (StableHLO via jax.export)")
    p.add_argument("--config", type=str, required=True,
                   help="VAE config yaml")
    p.add_argument("--test_model", type=str, default="",
                   help="checkpoint to export (fresh-init params if empty, "
                        "for pipeline smoke tests)")
    p.add_argument("--out", type=str, required=True,
                   help="output bundle directory")
    p.add_argument("--trajectory_config", type=str, default="",
                   help="optionally add the trajectory predictor")
    p.add_argument("--trajectory_test_model", type=str, default="")
    p.add_argument("--mean_std", type=str, default="",
                   help="dataset stats npy for the trajectory export "
                        "(default: the vendored AMASS stats)")
    p.add_argument("--platforms", type=str, default="cpu,tpu",
                   help="comma-separated lowering targets")
    p.add_argument("--serve_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 = serving-optimised bundle: bf16 weight "
                        "constants (half the artifact + weight HBM traffic) "
                        "and bf16 conv compute; ~1e-2 output deviation")
    args = p.parse_args(argv)

    import tempfile

    from ..apps.export import export_bundle
    from ..data import layout
    from ..train.trainer import Trainer
    from ..utils.config import load_config

    cfg = load_config(args.config)
    scratch = tempfile.mkdtemp(prefix="hm_vae_export_")
    trainer = Trainer(cfg, os.path.join(scratch, "vae"))
    if args.test_model:
        trainer.load_params(args.test_model)

    trajectory = None
    if args.trajectory_config:
        tcfg = load_config(args.trajectory_config)
        ms = layout.load_mean_std(args.mean_std)
        t_trainer = Trainer(tcfg, os.path.join(scratch, "traj"), mean_std=ms)
        if args.trajectory_test_model:
            t_trainer.load_params(args.trajectory_test_model)
        trajectory = (t_trainer.model, t_trainer.state.params, ms)

    platforms = tuple(s.strip() for s in args.platforms.split(",") if s.strip())
    manifest = export_bundle(args.out, trainer.model, trainer.state.params,
                             cfg, trajectory=trajectory, platforms=platforms,
                             serve_dtype=args.serve_dtype)
    print(json.dumps({
        "out": args.out,
        "functions": {k: v["bytes"] for k, v in manifest["functions"].items()},
        "platforms": manifest["platforms"],
        "serve_dtype": manifest["serve_dtype"],
    }))


if __name__ == "__main__":
    main()
