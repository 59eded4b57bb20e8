"""Data preparation CLI.

``python -m hm_vae_tpu.cli.prep_data --amass_dir <raw AMASS root> --dest <dir>``
mirrors ``utils/process_all_data_motion.py`` + ``divide_train_val_json.py``
(conversion + subset-based splits + mean/std) in one pass; or
``--synthetic N`` to generate a synthetic dataset for smoke testing.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Prepare motion data")
    p.add_argument("--amass_dir", type=str, default="")
    p.add_argument("--dest", type=str, required=True)
    p.add_argument("--fps", type=int, default=30,
                   help="target fps (0 keeps original framerate)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic sequences instead of AMASS")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.synthetic:
        from ..data.synthetic import generate_dataset

        generate_dataset(args.dest, num_seqs=args.synthetic, seed=args.seed)
        print(f"wrote {args.synthetic} synthetic sequences to {args.dest}")
        return

    if not args.amass_dir:
        p.error("provide --amass_dir or --synthetic N")
    from ..data.amass_prep import process_amass_root

    splits = process_amass_root(
        args.amass_dir, args.dest,
        target_fps=args.fps if args.fps > 0 else None,
    )
    print({k: len(v) for k, v in splits.items()})


if __name__ == "__main__":
    main()
