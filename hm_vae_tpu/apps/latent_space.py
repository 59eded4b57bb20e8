"""Hierarchical latent-space exploration.

Implements the reference's *intended* latent-inspection surface — the Trainer
delegations ``check_hier_latent_space`` (``trainer_motion_vae.py:151-152``)
and ``vis_given_z_vec`` (``:187-188``) point at methods the released model
does not define.  Three probes over a trained VAE:

- :func:`level_sweep` — decode z ~ N(0, I) injected at ONE hierarchy level
  (all other levels zero).  Shows what each level encodes on its own, and
  *demonstrates* the decoder's 2-of-4 latent structure
  (``seq_two_hier_sa_vae.py:278-288``): sweeping a middle level decodes
  identically to the all-zero baseline.
- :func:`level_swap` — encode two motions, decode with one level's posterior
  mean taken from B and the rest from A.  Localises which motion content
  (global dynamics vs per-joint detail) each consumed level carries.
- :func:`latent_lerp` — linear interpolation between two motions' posterior
  means at a chosen subset of levels (both by default — latent-space motion
  morphing).

All probes return ``(rot_6d, rot_mat, pose)`` tuples from the shared
:class:`~hm_vae_tpu.apps.inference.VAEInference.decode_full` path, so outputs
drop straight into the existing visualization/metric machinery.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..apps.inference import VAEInference
from ..models.hm_vae import get_structure, prior_z_list


def _zero_z_list(cfg_model, batch: int) -> List[jnp.ndarray]:
    st = get_structure(cfg_model)
    return [jnp.zeros((batch, st.z_edges[i], st.z_dims[i]))
            for i in range(cfg_model.num_layers)]


def level_sweep(infer: VAEInference, key, batch: int = 1,
                scale: float = 1.0) -> Dict[str, Tuple]:
    """Per-level prior sweep: ``{"baseline", "level_0", ...} -> decode_full``.

    ``baseline`` decodes the all-zero z list; ``level_i`` additionally
    injects ``scale * N(0, I)`` at level i only.  Levels 1..n-2 must equal
    the baseline (decoder ignores them) — asserted by
    ``tests/test_latent_space.py``.
    """
    nl = infer.cfg.model.num_layers
    out: Dict[str, Tuple] = {}
    zeros = _zero_z_list(infer.cfg.model, batch)
    out["baseline"] = infer.decode_full(zeros)
    for lvl in range(nl):
        zs = list(zeros)
        zs[lvl] = scale * jax.random.normal(
            jax.random.fold_in(key, lvl), zeros[lvl].shape)
        out[f"level_{lvl}"] = infer.decode_full(zs)
    return out


def level_swap(infer: VAEInference, rot6d_a: jnp.ndarray,
               rot6d_b: jnp.ndarray, level: int) -> Tuple:
    """Decode A's posterior means with ``level`` replaced by B's.

    rot6d_a/b: (B, T, 24, 6).  ``level`` indexes the hierarchy (0 = shallow,
    num_layers-1 = deep; middles are decoder-inert by construction).
    """
    za = infer.mean_z(rot6d_a)
    zb = infer.mean_z(rot6d_b)
    zs = list(za)
    zs[level] = zb[level]
    return infer.decode_full(zs)


def latent_lerp(infer: VAEInference, rot6d_a: jnp.ndarray,
                rot6d_b: jnp.ndarray, num: int = 5,
                levels: Sequence[int] | None = None) -> List[Tuple]:
    """``num`` decodes along the line between A's and B's posterior means.

    ``levels`` restricts interpolation to a subset of hierarchy levels
    (default: all — with only the consumed deep+shallow mattering); the
    non-interpolated levels keep A's means.  Endpoints are the two motions'
    mean reconstructions.
    """
    za = infer.mean_z(rot6d_a)
    zb = infer.mean_z(rot6d_b)
    nl = infer.cfg.model.num_layers
    levels = tuple(range(nl)) if levels is None else tuple(levels)
    outs = []
    for i in range(num):
        t = i / max(num - 1, 1)
        zs = [(1.0 - t) * a + t * b if lvl in levels else a
              for lvl, (a, b) in enumerate(zip(za, zb))]
        outs.append(infer.decode_full(zs))
    return outs


def decode_given_z(infer: VAEInference, z_arrays: Sequence) -> Tuple:
    """``vis_given_z_vec``: decode a saved z-vector list (e.g. from an
    ``np.savez`` of a previous run or a latent-opt solve) through the full
    6D → rotmat → FK chain."""
    zs = [jnp.asarray(z) for z in z_arrays]
    exp = _zero_z_list(infer.cfg.model, zs[0].shape[0])
    if len(zs) != len(exp) or any(z.shape != e.shape for z, e in zip(zs, exp)):
        raise ValueError(
            f"z list shapes {[tuple(z.shape) for z in zs]} do not match the "
            f"model's {[tuple(e.shape) for e in exp]}")
    return infer.decode_full(zs)


__all__ = ["level_sweep", "level_swap", "latent_lerp", "decode_given_z",
           "prior_z_list"]
