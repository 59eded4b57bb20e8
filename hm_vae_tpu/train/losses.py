"""Pure loss functions for the VAE and trajectory models.

Replaces the reference's in-module loss computation + ``backward()``-inside-
forward (``seq_two_hier_sa_vae.py:335-417``) with pure functions suitable for
``jax.value_and_grad`` under jit/pjit.

The two-stage KL curriculum (``seq_two_hier_sa_vae.py:378-391``) is expressed
with a differentiable-correct ``jnp.where`` between live and
``stop_gradient``-ed branches: identical values either side of the switch, with
gradients masked before ``iteration_interval`` — jit-friendly, no Python
control flow on the traced step.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.hm_vae import HMVAE, reparametrize, split_stats
from ..ops import fk as fk_mod
from ..ops import rotations as rot
from ..utils.config import Config


def kl_normal(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(N(mu, sigma) || N(0, I)), summed over the latent dim, mean over rest.

    Matches ``kl_loss`` (``seq_two_hier_sa_vae.py:425-428``): the sum is over
    the last axis with (batch*k_edges) flattened and averaged.
    """
    per = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=-1)
    return jnp.mean(per)


def l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def _grad_gate(x: jnp.ndarray, active: jnp.ndarray) -> jnp.ndarray:
    """Value of x always; gradient only when ``active`` (traced bool)."""
    return jnp.where(active, x, jax.lax.stop_gradient(x))


def hmvae_forward(
    model: HMVAE,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    step: jnp.ndarray,
    cfg: Config,
    sample: bool = True,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """One full VAE forward + loss computation.

    Args:
      batch: dict with 'rot_6d' (B,T,24,6) and 'rot_mat' (B,T,24,3,3),
        unnormalised (the 7-tuple contract's first two fields).
      step: current iteration (traced scalar) for the KL curriculum.
      sample: reparametrize (training) vs use means (validation uses sampling
        too in the reference; ``sample=False`` gives mean reconstruction).

    Returns (total_loss, metrics) where metrics holds every logged scalar.
    """
    mcfg, lcfg = cfg.model, cfg.loss
    # compact-transfer paths: the 6D rep is exactly the first two columns of
    # the stored rotation matrices (utils/process_all_data_motion.py:136-137),
    # so whichever side is on the wire, the other derives on device —
    # rot6d from rotmat by slicing, rotmat from rot6d by Gram-Schmidt (exact
    # for true rotations; wire_format="rot6d" saves a further 33% bandwidth)
    rotmat_gt = batch.get("rot_mat")
    rot6d_gt = batch.get("rot_6d")
    if rotmat_gt is None and rot6d_gt is None:
        # axis-angle wire: 3 floats/joint, Rodrigues reconstruction (exact up
        # to the log-map round trip — tested in test_native_loader.py)
        rotmat_gt = rot.aa_to_rotmat(batch["aa"].astype(jnp.float32))
    if rot6d_gt is None:
        rot6d_gt = rot.rotmat_to_rot6d(rotmat_gt)
    if rotmat_gt is None:
        rotmat_gt = rot.rot6d_to_rotmat(rot6d_gt)
    B, T = rot6d_gt.shape[:2]

    # FK pose targets recomputed online from GT rotations and detached
    # (seq_two_hier_sa_vae.py:343-345)
    offsets = fk_mod.default_offsets()
    pose_gt = jax.lax.stop_gradient(fk_mod.fk_from_rotmat(rotmat_gt, offsets))

    _, z_stats = model.apply(params, rot6d_gt, method=HMVAE.encode)

    nl = mcfg.num_layers
    keys = jax.random.split(rng, nl)
    active_shallow = step >= lcfg.iteration_interval

    z_list: List[jnp.ndarray] = []
    kl_list: List[jnp.ndarray] = []
    for i, stats in enumerate(z_stats):
        mu, logvar = split_stats(stats, mcfg, i)
        if lcfg.kl_w != 0 and sample:
            z = reparametrize(keys[i], mu, logvar)
        else:
            z = mu
        if i == nl - 1:
            kl_i = kl_normal(mu, logvar)
        elif i == 0:
            # curriculum: value always computed, gradient gated on step
            kl_i = kl_normal(_grad_gate(mu, active_shallow),
                             _grad_gate(logvar, active_shallow))
            z = _grad_gate(z, active_shallow)
        else:
            kl_i = jnp.zeros(())
        z_list.append(z)
        kl_list.append(kl_i)

    out6d = model.apply(params, z_list, method=HMVAE.decode)  # (B,T,24,6)
    out_rotmat = rot.rot6d_to_rotmat(out6d)
    out_pose = fk_mod.fk_from_rotmat(out_rotmat, offsets)

    l_rec_6d = l2(out6d, rot6d_gt)
    l_rec_rot = l2(out_rotmat, rotmat_gt)
    l_rec_pose = l2(out_pose, pose_gt)
    l_kl = lcfg.kl_w * kl_list[nl - 1] + lcfg.shallow_kl_w * kl_list[0]

    total = (
        lcfg.rec_6d_w * l_rec_6d
        + lcfg.rec_rot_w * l_rec_rot
        + lcfg.rec_pose_w * l_rec_pose
        + l_kl
    )
    metrics = {
        "loss_total": total,
        "loss_kl": l_kl,
        "loss_rec_6d": l_rec_6d,
        "loss_rec_rot": l_rec_rot,
        "loss_rec_pose": l_rec_pose,
    }
    # one per-level KL metric per ACTUAL hierarchy level (the reference logs
    # exactly four because its num_layers is always 4,
    # trainer_motion_vae.py:56-60; indexing 4 levels unconditionally crashed
    # num_layers<4 configs the schema permits)
    for i in range(nl):
        metrics[f"loss_hier_kl_{i + 1}"] = kl_list[i]
    return total, metrics


def decode_full(model: HMVAE, params, z_list: Sequence[jnp.ndarray]):
    """z list -> (6d, rotmat, positions); the `_decode` postprocessing chain
    (seq_two_hier_sa_vae.py:436-474) as a pure function."""
    out6d = model.apply(params, z_list, method=HMVAE.decode)
    out_rotmat = rot.rot6d_to_rotmat(out6d)
    out_pose = fk_mod.fk_from_rotmat(out_rotmat, fk_mod.default_offsets())
    return out6d, out_rotmat, out_pose
