"""Batched, jitted test-time latent optimization.

The reference implements motion completion / interpolation / generation as
three copy-pasted 150-step Adam loops over ``nn.Parameter`` z vectors with an
optional deep-copied decoder fine-tuned after ``prev_epochs`` steps
(``seq_two_hier_sa_vae.py:1096-1268, 1270-1541, 1543-1841``).  Here there is
ONE engine:

- the entire optimization loop is a ``lax.scan`` inside a single jit — no
  Python-loop dispatch overhead, and windows/restarts batch over the leading
  axis (the apps in :mod:`hm_vae_tpu.apps.tasks` exploit this);
- the z-vs-decoder phase switch at ``prev_epochs``
  (``seq_two_hier_sa_vae.py:1206-1226``) becomes masked optimizer-state
  updates: both Adam states exist, only the active one advances, so each
  StepLR schedule counts exactly its own phase's steps — the reference's
  scheduler semantics under jit;
- the decoder clone + L2-pull-back regulariser (``reg_w_decoder``) is a
  functional param tree — no ``copy.deepcopy``.

Differences from the reference kept deliberately (cited):
- the reference *computes* min-loss outputs but returns the last iteration's
  (``seq_two_hier_sa_vae.py:1228-1236`` vs ``:1234``); both are returned here
  (``best_*`` and ``last_*``) and the apps use ``last`` for parity.
"""

from __future__ import annotations


from typing import List, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.hm_vae import HMVAE
from ..models.structure import get_structure
from ..ops import fk as fk_mod
from ..ops import rotations as rot
from ..utils.config import Config, LatentOptConfig


def _tree_where(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


@flax.struct.dataclass
class LatentOptResult:
    # all (B, T, 24, ...) arrays
    last_6d: jnp.ndarray
    last_rotmat: jnp.ndarray
    last_pose: jnp.ndarray
    best_6d: jnp.ndarray
    best_rotmat: jnp.ndarray
    best_pose: jnp.ndarray
    final_loss: jnp.ndarray          # (B,) per-sample final masked loss
    loss_history: jnp.ndarray        # (opt_it,) batch-mean total loss


def init_z(key, cfg: Config, batch: int) -> List[jnp.ndarray]:
    """Random deep+shallow z, zero middles — the apps' starting point
    (``seq_two_hier_sa_vae.py:1664-1676``)."""
    st = get_structure(cfg.model)
    nl = cfg.model.num_layers
    keys = jax.random.split(key, nl)
    zs = []
    for i in range(nl):
        shape = (batch, st.z_edges[i], st.z_dims[i])
        if i == 0 or i == nl - 1:
            zs.append(jax.random.normal(keys[i], shape))
        else:
            zs.append(jnp.zeros(shape))
    return zs


def make_latent_optimizer(model: HMVAE, cfg: Config,
                          lat: Optional[LatentOptConfig] = None,
                          trajectory: Optional[tuple] = None,
                          key_frames: Optional[tuple] = None):
    """Build the jitted solver.

    Returns ``solve(dec_params, targets, mask, z_init, z_reg_target)`` where
      targets = dict(rot_6d (B,T,24,6), rot_mat (B,T,24,3,3), pose (B,T,24,3)),
      mask = (B, T, 24) visibility (1 = supervised),
      z_init / z_reg_target = z lists (batched).

    With ``trajectory=(traj_model, traj_params, mean_std)`` and static
    ``key_frames`` indices, a keyframe root-trajectory loss is added
    (``optimize_trajectory``, ``seq_two_hier_sa_vae.py:1379-1391``): the
    trajectory model runs on the decoded pose *inside* the optimization loop,
    and relative root displacements between consecutive keyframes are pulled
    toward the GT's (``cal_key_frame_root_loss``, ``:1031-1045``); ``targets``
    then needs a ``root_trans`` (B, T, 3) entry.
    """
    lat = lat or cfg.latent_opt
    lcfg = cfg.loss
    offsets = fk_mod.default_offsets()

    use_traj = trajectory is not None and lat.optimize_trajectory
    if use_traj:
        traj_model, traj_params, traj_ms = trajectory
        from ..data import layout as _layout

        _pos_mean = jnp.asarray(traj_ms[0][_layout.COORD]).reshape(24, 3)
        _pos_std = jnp.asarray(traj_ms[1][_layout.COORD]).reshape(24, 3)
        _rv_mean = jnp.asarray(traj_ms[0][_layout.ROOT_V])
        _rv_std = jnp.asarray(traj_ms[1][_layout.ROOT_V])
        _key = jnp.asarray(key_frames, jnp.int32)

        def traj_loss(out_pose, gt_root_trans):
            normalized = (out_pose - _pos_mean) / _pos_std
            root_v_n = traj_model.apply(traj_params, normalized)  # (B,T,3)
            root_v = _rv_mean + _rv_std * root_v_n
            trans = jnp.cumsum(root_v.at[:, 0].set(0.0), axis=1)
            rel_pred = jnp.diff(trans[:, _key], axis=1)
            rel_gt = jnp.diff(gt_root_trans[:, _key], axis=1)
            return jnp.mean((rel_pred - rel_gt) ** 2)

    z_tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(_steplr(lat.opt_lr, lat)),
    )
    dec_tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(_steplr(lat.opt_lr * 1e-3, lat)),
    )

    def decode(dec_params, z_list):
        out6d = model.apply(dec_params, z_list, method=HMVAE.decode)
        out_rotmat = rot.rot6d_to_rotmat(out6d)
        out_pose = fk_mod.fk_from_rotmat(out_rotmat, offsets)
        return out6d, out_rotmat, out_pose

    def masked_loss(out, targets, mask):
        m6 = mask[..., None]
        mm = mask[..., None, None]
        out6d, out_rotmat, out_pose = out
        l6 = jnp.mean((out6d - targets["rot_6d"]) ** 2 * m6)
        lr = jnp.mean((out_rotmat - targets["rot_mat"]) ** 2 * mm)
        lp = jnp.mean((out_pose - targets["pose"]) ** 2 * m6)
        return (lcfg.rec_6d_w * l6 + lcfg.rec_rot_w * lr
                + lcfg.rec_pose_w * lp)

    def total_loss(z_list, dec_params, orig_dec, targets, mask, z_reg_target):
        out = decode(dec_params, z_list)
        l_rec = masked_loss(out, targets, mask)
        # z regulariser on shallow (0) + deep (last) only
        # (seq_two_hier_sa_vae.py:1711-1712)
        l_reg = (jnp.mean((z_list[0] - z_reg_target[0]) ** 2)
                 + jnp.mean((z_list[-1] - z_reg_target[-1]) ** 2))
        # decoder pull-back: per-tensor mean L2 summed over tensors
        # (seq_two_hier_sa_vae.py:1714-1717)
        if lat.optimize_decoder:
            diffs = jax.tree.map(lambda a, b: jnp.mean((a - b) ** 2),
                                 dec_params, orig_dec)
            l_reg_dec = sum(jax.tree.leaves(diffs))
        else:
            l_reg_dec = jnp.zeros(())
        total = (l_rec + lat.reg_w * l_reg + lat.reg_w_decoder * l_reg_dec)
        if use_traj:
            total = total + lat.reg_w_trajectory * traj_loss(
                out[2], targets["root_trans"])
        return total, out

    def solve(dec_params, targets, mask, z_init, z_reg_target) -> LatentOptResult:
        orig_dec = dec_params
        z0 = z_init
        z_opt0 = z_tx.init(z0)
        dec_opt0 = dec_tx.init(dec_params)
        out0 = decode(dec_params, z0)
        big = jnp.full((), jnp.inf)

        def body(carry, i):
            z, z_opt, dec_p, dec_opt, best = carry
            (loss, out), (gz, gd) = jax.value_and_grad(
                total_loss, argnums=(0, 1), has_aux=True
            )(z, dec_p, orig_dec, targets, mask, z_reg_target)

            dec_phase = jnp.logical_and(
                jnp.asarray(lat.optimize_decoder), i > lat.prev_epochs
            )

            # z update only in the z phase; its Adam/schedule state freezes
            # in the decoder phase (and vice versa)
            z_upd, z_opt_new = z_tx.update(gz, z_opt, z)
            z_new = optax.apply_updates(z, z_upd)
            z = _tree_where(dec_phase, z, z_new)
            z_opt = _tree_where(dec_phase, z_opt, z_opt_new)

            if lat.optimize_decoder:
                d_upd, dec_opt_new = dec_tx.update(gd, dec_opt, dec_p)
                dec_new = optax.apply_updates(dec_p, d_upd)
                dec_p = _tree_where(dec_phase, dec_new, dec_p)
                dec_opt = _tree_where(dec_phase, dec_opt_new, dec_opt)

            best_loss, best_out = best
            better = loss < best_loss
            best = (
                jnp.where(better, loss, best_loss),
                _tree_where(better, out, best_out),
            )
            return (z, z_opt, dec_p, dec_opt, best), (loss, out)

        (z, _, dec_p, _, best), (losses, outs) = jax.lax.scan(
            body, (z0, z_opt0, dec_params, dec_opt0, (big, out0)),
            jnp.arange(lat.opt_it),
        )
        last = jax.tree.map(lambda x: x[-1], outs)
        best_loss, best_out = best

        # per-sample final masked reconstruction loss (same weighting as the
        # objective, minus regularisers) — used for restart selection
        m6 = mask[..., None]
        mm = mask[..., None, None]

        def per(x, t, m):
            return jnp.mean((x - t) ** 2 * m, axis=tuple(range(1, x.ndim)))

        per_sample = (
            lcfg.rec_6d_w * per(last[0], targets["rot_6d"], m6)
            + lcfg.rec_rot_w * per(last[1], targets["rot_mat"], mm)
            + lcfg.rec_pose_w * per(last[2], targets["pose"], m6)
        )
        return LatentOptResult(
            last_6d=last[0], last_rotmat=last[1], last_pose=last[2],
            best_6d=best_out[0], best_rotmat=best_out[1], best_pose=best_out[2],
            final_loss=per_sample, loss_history=losses,
        )

    return jax.jit(solve)


def _steplr(lr: float, lat: LatentOptConfig):
    if lat.opt_lr_policy == "constant":
        return lambda step: lr
    return lambda step: lr * lat.opt_gamma ** (step // lat.opt_step_size)


def replace_with_target(result_field, target_field, mask):
    """Overwrite supervised entries with targets (replace_*_with_gt,
    seq_two_hier_sa_vae.py:1441-1448, 1763-1770)."""
    m = mask
    while m.ndim < result_field.ndim:
        m = m[..., None]
    return m * target_field + (1.0 - m) * result_field
