"""Training CLI: ``python -m hm_vae_tpu.cli.train --config <yaml> [...]``.

Flag-compatible with the reference driver (``train_motion_vae.py:20-40``):
``--config --output_path --resume --test_model``; ``--multigpus`` is accepted
and ignored (SPMD over the mesh replaces DataParallel automatically).
"""

from __future__ import annotations

import argparse
import os
import shutil


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Train hm-vae / trajectory models")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--test_batch_size", type=int, default=10)
    p.add_argument("--multigpus", action="store_true",
                   help="ignored: SPMD shards over all devices by default")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--max_iter", type=int, default=None,
                   help="override config max_iter")
    p.add_argument("--data_root", type=str, default=None)
    args = p.parse_args(argv)

    from ..train.trainer import build_trainer
    from ..utils.config import load_config

    cfg = load_config(args.config)
    if args.data_root:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, data_root=args.data_root))

    model_name = os.path.splitext(os.path.basename(args.config))[0]
    output_dir = os.path.join(args.output_path, "outputs", model_name)
    os.makedirs(output_dir, exist_ok=True)
    shutil.copyfile(args.config, os.path.join(output_dir, "config.yaml"))

    trainer, train_ds, val_ds, test_ds = build_trainer(cfg, output_dir)

    if args.resume:
        step = trainer.resume()
        print(f"Resume from iteration {step}")
    if args.test_model:
        trainer.load_params(args.test_model)

    def log_cb(step, metrics):
        msg = ", ".join(f"{k.removeprefix('loss_')}: {v:.4f}"
                        for k, v in sorted(metrics.items()))
        print(f"[{step:08d}] {msg}", flush=True)

    metrics = trainer.fit(train_ds, val_ds, max_iter=args.max_iter,
                          log_cb=log_cb, test_ds=test_ds)
    trainer.save()
    trainer.wait_for_saves()  # surface async-write errors before reporting
    print("Finish Training", metrics)


if __name__ == "__main__":
    main()
