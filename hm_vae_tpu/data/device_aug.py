"""Device-side random root-rotation augmentation (jitted, per-batch RNG).

The reference applies the augmentation per item on the host
(``utils_motion_vae.py:161-185``): a uniform random rotation (Graphics-Gems
``rand_rotation_matrix``, ``:17-57``) premultiplied onto the root joint's
rotation matrix and the (unnormalised) root velocity, with the 6D rep
regenerated from the rotated matrices.  The numpy port lives in
:meth:`hm_vae_tpu.data.dataset.MotionDataset._augment_root_rot`, but routing
aug through the host sampler forfeits the C++ fast path (the sampler would
need the aug replicated in C++ and the wire would have to carry full
matrices).  Here the aug is a *jitted per-batch device op* applied inside the
Trainer's ingest (SURVEY §7 item 4): the C++ loader keeps shipping compact
un-augmented windows (aa / rot6d / rotmat wire), and the rotation happens on
the TPU where it is a few fused VPU ops.

Semantics per wire field (only the ROOT joint's orientation and the root
velocity change, exactly like the reference):

- ``rot_mat``: root slice premultiplied by R;
- ``rot_6d``: the 6D rep IS the first two matrix columns, so the root's two
  column vectors are rotated directly (equivalent to regenerating from the
  rotated matrix);
- ``aa`` (axis-angle wire): root recomposed through the SO(3) exp/log maps —
  ``aa' = log(R @ exp(aa))``;
- ``root_v``: de-standardised with the dataset stats, rotated, re-standardised
  (the wire carries normalised root_v, ``utils_motion_vae.py:108-114``).

Fields the reference leaves untouched stay untouched (joint_pos / linear_v /
angular_v are *not* rotated — ``utils_motion_vae.py:161-185`` touches only
the three root quantities, and its own comment says "When data_aug is True,
only use seq_rot_6d, seq_rot_mat").  The only aug-enabled reference config
is the len-8 VAE (``len8_data_aug_hm_vae.yaml``; the trajectory config has
``random_root_rot_flag: False``), whose loss consumes exactly the rotation
fields — so VAE training under this aug is semantically identical to the
reference on every wire.  One documented divergence: a trajectory model
trained on the COMPACT wire with aug on derives joint positions by FK of the
(rotated) rotations, i.e. consistently-rotated inputs, where the reference's
host aug pairs unrotated stored positions with rotated root_v; no reference
config exercises that combination.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import rotations as rot
from . import layout


def random_rotation_matrices(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform random rotations on device, Graphics-Gems method.

    Identical distribution to the host sampler
    (:func:`hm_vae_tpu.data.dataset.random_rotation_matrices`, itself the
    reference's ``rand_rotation_matrix`` with ``deflection=1``,
    ``utils_motion_vae.py:17-57``): R = (V V^T - I) Rz with V the random
    reflection vector and Rz a random z-rotation.
    """
    shape = tuple(shape)
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, shape, minval=0.0, maxval=2.0 * jnp.pi)
    phi = jax.random.uniform(k2, shape, minval=0.0, maxval=2.0 * jnp.pi)
    z = jax.random.uniform(k3, shape, minval=0.0, maxval=2.0)
    r = jnp.sqrt(z)
    V = jnp.stack([jnp.sin(phi) * r, jnp.cos(phi) * r, jnp.sqrt(2.0 - z)],
                  axis=-1)                       # (..., 3)
    st, ct = jnp.sin(theta), jnp.cos(theta)
    zero = jnp.zeros_like(ct)
    one = jnp.ones_like(ct)
    Rz = jnp.stack([
        jnp.stack([ct, st, zero], axis=-1),
        jnp.stack([-st, ct, zero], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)                                  # (..., 3, 3)
    H = V[..., :, None] * V[..., None, :] - jnp.eye(3)
    return rot.mat3_mul(H, Rz)


def apply_root_rot(batch: Dict[str, jnp.ndarray], R: jnp.ndarray,
                   rv_mean: jnp.ndarray, rv_std: jnp.ndarray
                   ) -> Dict[str, jnp.ndarray]:
    """Premultiply per-sample rotations R (prefix, 3, 3) onto the batch's
    root quantities.  Pure function of (batch, R) so the rotation *draw* and
    the *application* test independently; shape-agnostic over leading batch
    dims (works for (B, T, ...) batches and (K, B, T, ...) superbatches)."""
    out = dict(batch)
    Rt = R[..., None, :, :]                      # broadcast over T
    if "rot_mat" in batch:
        rm = batch["rot_mat"]                    # (..., T, 24, 3, 3)
        new_root = rot.mat3_mul(Rt, rm[..., 0, :, :])
        out["rot_mat"] = rm.at[..., 0, :, :].set(new_root)
    if "rot_6d" in batch:
        r6 = batch["rot_6d"]                     # (..., T, 24, 6)
        root = r6[..., 0, :]
        c0 = rot.mat3_apply(Rt, root[..., :3])
        c1 = rot.mat3_apply(Rt, root[..., 3:])
        out["rot_6d"] = r6.at[..., 0, :].set(
            jnp.concatenate([c0, c1], axis=-1))
    if "aa" in batch:
        aa = batch["aa"]                         # (..., T, 24, 3)
        root_m = rot.aa_to_rotmat(aa[..., 0, :].astype(jnp.float32))
        new_root = rot.rotmat_to_aa(rot.mat3_mul(Rt, root_m))
        out["aa"] = aa.at[..., 0, :].set(new_root.astype(aa.dtype))
    if "root_v" in batch:
        rv = batch["root_v"]                     # (..., T, 3), normalised
        raw = rv * rv_std + rv_mean
        out["root_v"] = (rot.mat3_apply(Rt, raw) - rv_mean) / rv_std
    return out


def make_root_rot_augment(mean_std: Optional[np.ndarray]):
    """Returns ``augment(batch, key) -> batch`` for use inside a jitted
    ingest.  ``mean_std`` (2, 579) supplies the root_v de/re-standardisation
    stats; None is accepted ONLY for batches that carry no ``root_v`` —
    rotating a *normalised* root velocity would be silently wrong (rotation
    does not commute with the per-axis z-norm), so a root_v batch without
    stats raises at trace time."""
    if mean_std is not None:
        rv_mean = jnp.asarray(np.asarray(mean_std)[0][layout.ROOT_V],
                              jnp.float32)
        std = np.asarray(mean_std)[1][layout.ROOT_V].copy()
        std[std == 0] = 1.0
        rv_std = jnp.asarray(std, jnp.float32)
    else:
        rv_mean = rv_std = None

    def augment(batch: Dict[str, jnp.ndarray], key: jax.Array):
        if "root_v" in batch and rv_mean is None:
            raise ValueError(
                "root-rot augmentation on a root_v-carrying batch needs the "
                "dataset mean/std (pass mean_std to the Trainer / "
                "make_root_rot_augment): the wire's root_v is normalised "
                "and must be de-standardised before rotation")
        for f, ndims in (("aa", 3), ("rot_6d", 3), ("rot_mat", 4)):
            if f in batch:
                prefix = batch[f].shape[:-ndims]
                break
        else:
            raise ValueError(
                "batch carries no rotation field (aa/rot_6d/rot_mat)")
        R = random_rotation_matrices(key, prefix)
        return apply_root_rot(batch, R, rv_mean, rv_std)

    return augment
