"""VIBE-output refinement CLI.

Parity with ``refine_dance_motions`` (``seq_two_hier_sa_vae.py:848-922``) and
the ``get_mean_rec_res`` VIBE-interop path (``trajectory_pred_model.py:517-549``),
minus the reference's hard-coded pickle paths (and its latent ``joblib``
NameError): takes a ``vibe_output.pkl`` (dict of person -> {'pose': (T, 72)})
or a raw ``.npy`` of axis-angle poses, refines each sequence with sliding
center-frame mean reconstruction, and saves our/VIBE rotation matrices (+ an
optional side-by-side animation).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def load_pose_sequences(path: str):
    """Yield (name, (T, 72) axis-angle) from a VIBE pkl or a npy file."""
    if path.endswith(".pkl"):
        import joblib

        data = joblib.load(path)
        for pid, entry in data.items():
            yield str(pid), np.asarray(entry["pose"], np.float32)
    else:
        arr = np.load(path)
        if arr.ndim == 2 and arr.shape[1] == 72:
            yield os.path.splitext(os.path.basename(path))[0], arr.astype(np.float32)
        else:
            raise ValueError(f"expected (T, 72) axis-angle npy, got {arr.shape}")


def main(argv=None):
    from . import apply_platform_env
    apply_platform_env()
    p = argparse.ArgumentParser(description="Refine VIBE pose estimates")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--test_model", type=str, default="")
    p.add_argument("--vibe_output", type=str, required=True,
                   help="vibe_output.pkl or (T,72) axis-angle .npy")
    p.add_argument("--output_path", type=str, default="./")
    p.add_argument("--gen_vis", action="store_true")
    p.add_argument("--vibe_order_6d", action="store_true",
                   help="also save refined 6D in VIBE layout for re-injection")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..apps.inference import VAEInference, aa_to_all_reps
    from ..ops import fk as fk_mod
    from ..ops import rotations as rot
    from ..train.trainer import build_trainer
    from ..utils.config import load_config
    from ..utils.viz import save_animation

    cfg = load_config(args.config)
    output_dir = os.path.join(args.output_path, "refine_vibe")
    os.makedirs(output_dir, exist_ok=True)

    trainer, *_ = build_trainer(cfg, output_dir)
    if args.test_model:
        trainer.load_params(args.test_model)
    infer = VAEInference(trainer.model, trainer.state.params, cfg)

    for name, aa in load_pose_sequences(args.vibe_output):
        six, mats, pose = aa_to_all_reps(jnp.asarray(aa[None]))
        refined_6d = infer.refine_sliding_window(six[0])  # (T, 24, 6)
        refined_rot = rot.rot6d_to_rotmat(refined_6d)
        np.save(os.path.join(output_dir, f"{name}_our_rot_mat.npy"),
                np.asarray(refined_rot))
        np.save(os.path.join(output_dir, f"{name}_vibe_rot_mat.npy"),
                np.asarray(mats[0]))
        if args.vibe_order_6d:
            vibe6d = rot.rot6d_ours_to_vibe(rot.rotmat_to_rot6d(refined_rot))
            np.save(os.path.join(output_dir, f"{name}_our_6d_vibe_order.npy"),
                    np.asarray(vibe6d))
        if args.gen_vis:
            ref_pose = fk_mod.fk_from_rotmat(refined_rot, fk_mod.default_offsets())
            vibe_pose = np.asarray(pose[0])
            ours = np.asarray(ref_pose)
            ours[:, :, 0] += 1.0  # offset for side-by-side (reference :904)
            save_animation(np.stack([vibe_pose, ours]),
                           os.path.join(output_dir, f"{name}_cmp.mp4"))
        print(f"refined {name}: {aa.shape[0]} frames")


if __name__ == "__main__":
    main()
