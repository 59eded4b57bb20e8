"""Inference utilities: mean reconstruction, prior sampling, VIBE refinement.

Covers the reference's eval-time methods as pure batched functions:
- ``test``/``gen_seq`` (mean-z reconstruction + prior samples decoded
  side-by-side, ``seq_two_hier_sa_vae.py:560-642``);
- ``sample_single_seq`` / ``sample_single_seq_w_trajectory``
  (``:781-846``) — prior sampling with 6D re-orthonormalisation;
- ``adjust_root_rot`` / ``apply_root_rot_to_translation`` (``:531-558``);
- ``aa2others`` (``:656-675``) — axis-angle ingestion for VIBE/SMPL params;
- ``refine_dance_motions``-style sliding center-frame refinement
  (``:848-922``), generalised to take any pose array instead of a hard-coded
  VIBE pickle path.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.hm_vae import HMVAE, prior_z_list, split_stats
from ..ops import fk as fk_mod
from ..ops import rotations as rot
from ..utils.config import Config


def make_inference_fns(model: HMVAE, params, cfg: Config):
    """Pure, params-closed inference functions — the single source of truth
    shared by :class:`VAEInference` (which jits them for in-process use) and
    :mod:`hm_vae_tpu.apps.export` (which AOT-serializes them for serving), so
    the exported artifact cannot silently diverge from in-process inference.

    Returns ``{"encode_mean", "decode_full", "reconstruct"}``; z lists are
    passed/returned as tuples (a stable pytree for jit and export).
    """
    offsets = fk_mod.default_offsets()

    def encode_mean(x6d):
        _, stats = model.apply(params, x6d, method=HMVAE.encode)
        return tuple(split_stats(s, cfg.model, i)[0]
                     for i, s in enumerate(stats))

    def decode_full(z_tuple):
        out6d = model.apply(params, list(z_tuple), method=HMVAE.decode)
        out_rotmat = rot.rot6d_to_rotmat(out6d)
        out_pose = fk_mod.fk_from_rotmat(out_rotmat, offsets)
        return out6d, out_rotmat, out_pose

    def reconstruct(x6d):
        return decode_full(encode_mean(x6d))

    return {"encode_mean": encode_mean, "decode_full": decode_full,
            "reconstruct": reconstruct}


class VAEInference:
    """Bound (model, params) inference helper."""

    def __init__(self, model: HMVAE, params, cfg: Config):
        self.model = model
        self.params = params
        self.cfg = cfg
        fns = make_inference_fns(model, params, cfg)
        self._encode_mean = jax.jit(fns["encode_mean"])
        self._decode_full = jax.jit(fns["decode_full"])
        self._reconstruct = jax.jit(fns["reconstruct"])

    # ------------------------------------------------------------------
    def mean_z(self, rot6d: jnp.ndarray):
        """(B, T, 24, 6) -> mean z list (posterior means, no sampling)."""
        return list(self._encode_mean(rot6d))

    def mean_reconstruction(self, rot6d: jnp.ndarray):
        """Posterior-mean reconstruction: 6D in -> (6d, rotmat, pose) out
        (one fused dispatch)."""
        return self._reconstruct(rot6d)

    def decode_full(self, z_list):
        return self._decode_full(tuple(z_list))

    def prior_samples(self, key, batch: int):
        """Decode z ~ N(0, I) (deep+shallow; zero middles)."""
        return self.decode_full(prior_z_list(key, self.cfg.model, batch))

    def clean_6d(self, out6d: jnp.ndarray) -> jnp.ndarray:
        """Re-orthonormalise a decoded 6D rep (project through a rotmat),
        used before feeding the trajectory model
        (``seq_two_hier_sa_vae.py:791-794``)."""
        return rot.rotmat_to_rot6d(rot.rot6d_to_rotmat(out6d))

    # ------------------------------------------------------------------
    def refine_sliding_window(self, rot6d_seq: jnp.ndarray) -> jnp.ndarray:
        """Center-frame sliding-window mean reconstruction of a long sequence.

        rot6d_seq: (T, 24, 6) e.g. converted VIBE estimates.  Windows of
        ``train_seq_len`` slide with stride 1; each contributes its center
        frame (head/tail filled from the first/last window), matching
        ``refine_dance_motions`` (``seq_two_hier_sa_vae.py:876-898``).
        All windows are reconstructed in ONE batched call instead of the
        reference's sequential loop.
        """
        W = self.cfg.model.train_seq_len
        T = rot6d_seq.shape[0]
        if T < W:
            raise ValueError(f"sequence shorter than window: {T} < {W}")
        c0 = W // 2 - 1
        n_win = T - W + 1
        idx = np.arange(n_win)[:, None] + np.arange(W)[None, :]
        windows = rot6d_seq[idx]  # (n_win, W, 24, 6)
        rec6d, _, _ = self.mean_reconstruction(windows)
        head = rec6d[0, : c0 + 1]                  # frames 0..c0 from window 0
        mids = rec6d[1:-1, c0]                     # center frames
        tail = rec6d[-1, c0:]                      # rest from the last window
        out = jnp.concatenate((head, mids.reshape((-1,) + rec6d.shape[2:]),
                               tail), axis=0)
        assert out.shape[0] == T, (out.shape, T)
        return out


# ----------------------------------------------------------------------
def adjust_root_rot(seq_rotmat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate each sequence so its first frame's root rotation is identity.

    seq_rotmat: (B, T, 24, 3, 3).  Returns (adjusted, relative_rot (B,T,3,3))
    — visualization alignment (``seq_two_hier_sa_vae.py:531-551``).
    """
    root0 = seq_rotmat[:, 0, 0]                       # (B, 3, 3)
    rel = jnp.swapaxes(root0, -1, -2)                 # identity @ R0^T
    T = seq_rotmat.shape[1]
    rel_t = jnp.broadcast_to(rel[:, None], (rel.shape[0], T, 3, 3))
    new_root = jnp.einsum("btij,btjk->btik", rel_t, seq_rotmat[:, :, 0])
    out = seq_rotmat.at[:, :, 0].set(new_root)
    return out, rel_t


def apply_root_rot_to_translation(rel_rot: jnp.ndarray, root_v: jnp.ndarray):
    """(B, T, 3, 3) x (B, T, 3) -> rotated root velocities
    (``seq_two_hier_sa_vae.py:553-558``)."""
    return jnp.einsum("btij,btj->bti", rel_rot, root_v)


def aa_to_all_reps(aa_seq: jnp.ndarray):
    """Axis-angle (B, T, 24*3) -> (rot6d, rotmat, fk positions).

    Ingestion path for VIBE/SMPL pose parameters (``aa2others``,
    ``seq_two_hier_sa_vae.py:656-675``) without torchgeometry.
    """
    B, T = aa_seq.shape[:2]
    aa = aa_seq.reshape(B, T, 24, 3)
    mats = rot.aa_to_rotmat(aa)
    six = rot.rotmat_to_rot6d(mats)
    pose = fk_mod.fk_from_rotmat(mats, fk_mod.default_offsets())
    return six, mats, pose
