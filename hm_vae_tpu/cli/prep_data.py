"""Data preparation CLI.

``python -m hm_vae_tpu.cli.prep_data --amass_dir <raw AMASS root> --dest <dir>``
mirrors ``utils/process_all_data_motion.py`` + ``divide_train_val_json.py``
(conversion + subset-based splits + mean/std) in one pass; or
``--synthetic N`` to generate a synthetic dataset for smoke testing.

``--gen_masks P [P2 ...]`` generates the precomputed per-frame random joint
masks for the ``missing_joint_prob`` completion evaluation — the workflow
``EvalMotionSeqData`` loads from ``mask_dir`` (``utils_motion_vae.py:247,
276-277``; the reference repo ships no generator).  One (T, 24) 0/1 npy per
test sequence is written under ``<dest>/eval_masks/missing_prob_<P>/``.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Prepare motion data")
    p.add_argument("--amass_dir", type=str, default="")
    p.add_argument("--dest", type=str, required=True)
    p.add_argument("--fps", type=int, default=30,
                   help="target fps (0 keeps original framerate)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic sequences instead of AMASS")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gen_masks", type=float, nargs="+", default=None,
                   metavar="PROB",
                   help="generate per-frame random joint-visibility masks for "
                        "these missing_joint_prob values over the test split")
    p.add_argument("--mask_split", type=str, default="test",
                   choices=("train", "val", "test"))
    args = p.parse_args(argv)

    if args.gen_masks:
        written = generate_masks(args.dest, args.gen_masks,
                                 split=args.mask_split, seed=args.seed)
        for prob, (d, n) in written.items():
            print(f"missing_prob_{prob}: {n} masks -> {d}")
        return

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


def generate_masks(data_root: str, probs, split: str = "test", seed: int = 0):
    """Write (T, 24) 0/1 visibility masks (1 = visible) per sequence, one
    folder per missing probability; deterministic per (seed, prob, name)."""
    import json
    import os

    import numpy as np

    with open(os.path.join(data_root, f"{split}.json")) as f:
        ids = json.load(f)
    names = [ids[k] for k in sorted(ids, key=int)]
    out = {}
    for prob in probs:
        dest = os.path.join(data_root, "eval_masks", f"missing_prob_{prob}")
        os.makedirs(dest, exist_ok=True)
        n = 0
        for name in names:
            seq = np.load(os.path.join(data_root, "seqs", name),
                          mmap_mode="r")
            T = seq.shape[0]
            # stable across processes (Python's str hash is salted)
            import zlib

            rng = np.random.default_rng(
                zlib.crc32(f"{seed}/{prob}/{name}".encode()))
            mask = (rng.random((T, 24)) >= prob).astype(np.float32)
            np.save(os.path.join(dest, name), mask)
            n += 1
        out[prob] = (dest, n)
    return out


if __name__ == "__main__":
    main()
