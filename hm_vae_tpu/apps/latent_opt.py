"""Batched, jitted test-time latent optimization.

The reference implements motion completion / interpolation / generation as
three copy-pasted 150-step Adam loops over ``nn.Parameter`` z vectors with an
optional deep-copied decoder fine-tuned after ``prev_epochs`` steps
(``seq_two_hier_sa_vae.py:1096-1268, 1270-1541, 1543-1841``).  Here there is
ONE engine:

- the entire optimization loop runs inside a single jit — no Python-loop
  dispatch overhead, and windows/restarts batch over the leading axis (the
  apps in :mod:`hm_vae_tpu.apps.tasks` exploit this);
- the z-vs-decoder phase switch at ``prev_epochs``
  (``seq_two_hier_sa_vae.py:1206-1226``) is *static* config, so the loop is
  TWO ``lax.scan`` calls (z phase, then decoder phase): each iteration runs
  exactly ONE fwd+bwd and one Adam step — the reference's semantics — and
  during the z phase the decoder weights are a closure constant, so XLA's
  loop-invariant code motion hoists the mask+pool-fold weight prep out of
  those iterations entirely;
- only the DECODER parameter subtree is cloned/optimized (the reference does
  ``copy.deepcopy(self.dec)``, ``seq_two_hier_sa_vae.py:1685-1687`` — the
  encoder never participates), as a functional param tree — no deepcopy, and
  no wasted Adam/weight-decay traffic over encoder tensors;
- with ``LatentOptConfig.per_window_decoder`` (default True) the solve is
  vmapped PER WINDOW: each batched window optimizes its own z against its own
  loss mean and fine-tunes its OWN decoder clone + Adam state — exactly the
  reference's per-window loops with their per-window ``deepcopy``
  (``:1343-1345``, ``:1685-1687``, inside the window loop), so batching
  windows/sequences is quality-neutral.  ``False`` restores the shared-clone
  batch-mean formulation (cheaper: decoder-phase HBM traffic is shared).

Differences from the reference kept deliberately (cited):
- the reference *computes* min-loss outputs but returns the last iteration's
  (``seq_two_hier_sa_vae.py:1753-1757`` vs ``:1759``); the apps use ``last``
  for parity, so min-loss tracking is behind ``LatentOptConfig.track_best``
  (default off — it costs an output-tree select per iteration); with it off,
  ``best_*`` alias ``last_*``.
- the scan carries optimizer state only and the final iteration runs outside
  it: stacking per-iteration output trees (the naive formulation) wrote
  ``opt_it x (B,T,24,..)`` arrays to HBM that nothing read.
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


def _scope_keys(dec_tree, scope: str):
    """Top-level decoder keys the fine-tune phase optimizes (the rest stay
    frozen at the trained weights and SHARED across windows).  The "lora"
    scope partitions at leaf granularity and is handled separately."""
    if scope == "full":
        return list(dec_tree)
    if scope == "heads":
        return [k for k in dec_tree if k.startswith("latent_dec")]
    if scope == "last_conv":
        convs = sorted((k for k in dec_tree if k.startswith("conv_")),
                       key=lambda k: int(k.split("_")[-1]))
        return convs[-1:]
    raise ValueError(f"unknown latent_opt.finetune_scope: {scope!r} "
                     "(expected full|lora|last_conv|heads)")


def _lora_reg(dec_train, orig_train):
    """The decoder pull-back term in WEIGHT space under the lora scope.

    For a factor pair the weight-space distance from the trained decoder is
    ``mean(delta^2)`` with ``delta = A @ B`` (``A0 == 0`` so the initial
    delta is exactly zero, like the reference's fresh deepcopy) — computed
    WITHOUT materializing the (out_f, in_f*K) delta via the Gram identity
    ``||AB||_F^2 = sum((A^T A) * (B B^T))`` (two r x r matrices).  Direct
    leaves (conv biases, latent heads) keep the reference's per-tensor
    ``mean((w - w0)^2)`` (seq_two_hier_sa_vae.py:1714-1717).
    """
    from flax import traverse_util

    flat_t = traverse_util.flatten_dict(dec_train)
    flat_o = traverse_util.flatten_dict(orig_train)
    total = jnp.zeros(())
    paired = set()
    for p, a in flat_t.items():
        if p[-1] != "lora_a":
            continue
        pb = p[:-1] + ("lora_b",)
        A = a.astype(jnp.float32)
        B2 = flat_t[pb].astype(jnp.float32).reshape(A.shape[1], -1)
        ga = A.T @ A
        gb = B2 @ B2.T
        total = total + jnp.sum(ga * gb) / (A.shape[0] * B2.shape[1])
        paired.add(p)
        paired.add(pb)
    for p, v in flat_t.items():
        if p in paired:
            continue
        o = flat_o[p]
        total = total + jnp.mean(
            (v.astype(jnp.float32) - o.astype(jnp.float32)) ** 2)
    return total


def _tree_where(cond, a, b):
    return jax.tree.map(lambda x, y: jnp.where(cond, x, y), a, b)


def _tree_where_b(cond_b, a, b):
    """Per-sample select: cond_b (B,) against (B, ...) leaves."""
    def sel(x, y):
        c = cond_b.reshape((-1,) + (1,) * (x.ndim - 1))
        return jnp.where(c, x, y)

    return jax.tree.map(sel, a, b)


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

    lora_mode = lat.finetune_scope == "lora"
    if lora_mode:
        import dataclasses as _dc

        # rebuild the module with rank-r adapters on the decoder convs
        # (models/hm_vae.py SkeletonConv.lora_rank); the checkpoint params
        # lack the adapter leaves — solve() initializes them (lora_a == 0,
        # so iteration 0 decodes EXACTLY like the base model)
        if lat.lora_rank <= 0:
            raise ValueError("latent_opt.finetune_scope='lora' needs "
                             f"lora_rank > 0, got {lat.lora_rank}")
        model = HMVAE(_dc.replace(model.cfg, lora_rank=lat.lora_rank),
                      model.init_type)

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

    # the decoder fine-tune phase is HBM-bound on decoder weight+moment
    # traffic; opt_moment_dtype="bfloat16" (LatentOptConfig) halves the moment
    # share with tested update precision (tests/test_train_step.py), and
    # opt_param_dtype="bfloat16" halves the clone-weight share (stochastic-
    # rounding write-back — train/optim.py:stochastic_round_updates; the
    # z variables stay f32, they are tiny)
    from ..train.optim import scale_by_adam_stored, stochastic_round_updates
    clone_bf16 = jnp.dtype(lat.opt_param_dtype) == jnp.bfloat16
    if not clone_bf16 and jnp.dtype(lat.opt_param_dtype) != jnp.float32:
        raise ValueError(
            f"unsupported latent_opt.opt_param_dtype: {lat.opt_param_dtype!r}")
    if lora_mode:
        # the per-window trainable state is KBs (factors + biases + heads);
        # bf16 storage would save nothing and cost precision — keep f32
        clone_bf16 = False
    z_tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        scale_by_adam_stored(moment_dtype=lat.opt_moment_dtype),
        optax.scale_by_learning_rate(_steplr(lat.opt_lr, lat)),
    )
    dec_parts = [
        optax.add_decayed_weights(cfg.optim.weight_decay),
        scale_by_adam_stored(moment_dtype=lat.opt_moment_dtype),
        optax.scale_by_learning_rate(_steplr(lat.opt_lr * 1e-3, lat)),
    ]
    if lora_mode and lat.lora_lr_mult != 1.0:
        # factor leaves only: an Adam step moves each element ~lr, so the
        # rank-r PRODUCT delta moves ~|A||B| per step — far less weight-space
        # motion than the reference's direct fine-tune at the same lr; the
        # multiplier restores it (direct leaves keep the reference LR)
        def _lora_leaf_mask(params):
            from flax import traverse_util

            flat = traverse_util.flatten_dict(params)
            return traverse_util.unflatten_dict(
                {p: p[-1].startswith("lora_") for p in flat})

        dec_parts.append(optax.masked(
            optax.scale(lat.lora_lr_mult), _lora_leaf_mask))
    if clone_bf16:
        dec_parts.append(stochastic_round_updates("bfloat16"))
    dec_tx = optax.chain(*dec_parts)

    def decode(dec_sub, z_list):
        # dec_sub holds ONLY the decoder subtree; encode is never called here
        out6d = model.apply(dec_sub, z_list, method=HMVAE.decode)
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

    def make_total_loss(wrap, orig_train):
        def total_loss(z_list, dec_train, targets, mask, z_reg_target):
            out = decode(wrap(dec_train), z_list)
            l_rec = masked_loss(out, targets, mask)
            # z regulariser on shallow (0) + deep (last) only
            # (seq_two_hier_sa_vae.py:1711-1712)
            l_reg = (jnp.mean((z_list[0] - z_reg_target[0]) ** 2)
                     + jnp.mean((z_list[-1] - z_reg_target[-1]) ** 2))
            # decoder pull-back: per-tensor mean L2 summed over tensors
            # (seq_two_hier_sa_vae.py:1714-1717); only the trainable subtree
            # contributes — frozen tensors never move, their term is zero
            if lat.optimize_decoder and lora_mode:
                # weight-space distance incl. the factor pairs' delta
                # (Gram identity — no dense delta materialization)
                l_reg_dec = _lora_reg(dec_train, orig_train)
            elif lat.optimize_decoder:
                diffs = jax.tree.map(
                    lambda a, b: jnp.mean(
                        (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2),
                    dec_train, orig_train)
                l_reg_dec = sum(jax.tree.leaves(diffs))
            else:
                l_reg_dec = jnp.zeros(())
            total = (l_rec + lat.reg_w * l_reg + lat.reg_w_decoder * l_reg_dec)
            if use_traj:
                total = total + lat.reg_w_trajectory * traj_loss(
                    out[2], targets["root_trans"])
            return total, out

        return total_loss

    def solve(params, targets, mask, z_init, z_reg_target) -> LatentOptResult:
        # only the decoder subtree is cloned and (optionally) fine-tuned —
        # copy.deepcopy(self.dec) in the reference (:1685-1687) — and within
        # it only the `finetune_scope` subtree is trainable; the frozen rest
        # stays a closure constant shared by every window
        dec_all = params["params"]["decoder"]
        if lora_mode:
            from flax import traverse_util

            # fresh adapter leaves (lora_a zero, lora_b scaled-uniform with a
            # fixed seed — deterministic like the reference's deepcopy); the
            # base weights in `params` are NOT re-initialized, only merged
            z1 = jax.tree.map(lambda x: x[:1], z_init)
            lora_vars = model.init(jax.random.PRNGKey(0), z1,
                                   method=HMVAE.decode)
            flat_lora = {
                p: v for p, v in traverse_util.flatten_dict(
                    lora_vars["params"]["decoder"]).items()
                if p[-1].startswith("lora_")
            }
            flat_base = traverse_util.flatten_dict(dec_all)
            # trainable: adapters + conv biases + latent re-inflation heads
            # (all per-window-small); frozen: the dense conv weights — shared
            # across windows, read once per iteration for the whole batch
            train_flat = dict(flat_lora)
            for p, v in flat_base.items():
                if p[0].startswith("latent_dec") or p[-1] == "bias":
                    train_flat[p] = v
            frozen_flat = {p: v for p, v in flat_base.items()
                           if p not in train_flat}
            train0 = traverse_util.unflatten_dict(train_flat)

            def wrap(dec_train):
                merged = dict(frozen_flat)
                merged.update(traverse_util.flatten_dict(dec_train))
                return {"params": {
                    "decoder": traverse_util.unflatten_dict(merged)}}
        else:
            train_keys = _scope_keys(dec_all, lat.finetune_scope)
            train0 = {k: dec_all[k] for k in train_keys}
        if clone_bf16:
            # the CLONE is stored bf16 (frozen remainder and z stay f32);
            # the pull-back target is the cast clone itself, so l_reg_dec
            # starts at exactly zero like the f32 deepcopy
            train0 = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16), train0)
        else:
            # a bf16-STORED checkpoint (optim.param_dtype training mode)
            # under an f32 solve: up-cast the clone once — otherwise
            # apply_updates' round-to-nearest cast back to bf16 silently
            # swallows sub-ulp fine-tune steps (the SR write-back only runs
            # when opt_param_dtype selects it)
            train0 = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, train0)
        if not lora_mode:
            frozen = {k: v for k, v in dec_all.items() if k not in train_keys}

            def wrap(dec_train):
                return {"params": {"decoder": dict(frozen, **dec_train)}}

        total_loss = make_total_loss(wrap, train0)
        z0 = z_init
        B = mask.shape[0]
        # per_window_decoder=True: the solve is vmapped per window — every
        # window optimizes its own z (own loss mean / Adam trajectory) and,
        # after prev_epochs, its OWN decoder clone + Adam state.  This is
        # exactly the reference's semantics, where each window runs a private
        # 150-step loop with a fresh copy.deepcopy(self.dec)
        # (seq_two_hier_sa_vae.py:1343-1345 interpolation, :1685-1687
        # completion — both inside the `for t_idx in range(num_windows)`
        # loop).  False keeps the round-2 batched formulation: batch-mean
        # loss and ONE shared decoder clone (cheaper — the ~190 MB/iteration
        # decoder weight+moment traffic is shared across the batch — but
        # couples the windows; measured ~2x interpolation MPJPE penalty when
        # shared across sequences, BASELINE.md).
        per_win = lat.per_window_decoder

        def total_loss_s(z1, dec_t1, tgt1, m1, zr1):
            zb = jax.tree.map(lambda x: x[None], z1)
            tb = jax.tree.map(lambda x: x[None], tgt1)
            zrb = jax.tree.map(lambda x: x[None], zr1)
            loss, out = total_loss(zb, dec_t1, tb, m1[None], zrb)
            return loss, jax.tree.map(lambda x: x[0], out)

        def z_step(z, z_opt, dec_t):
            # z_tx's LR schedule counts only z steps — the optax state's own
            # count drives it (matching the separate torch Adam/StepLR pair,
            # seq_two_hier_sa_vae.py:1162-1166)
            (loss, out), gz = jax.value_and_grad(
                total_loss, argnums=0, has_aux=True
            )(z, dec_t, targets, mask, z_reg_target)
            z_upd, z_opt = z_tx.update(gz, z_opt, z)
            return optax.apply_updates(z, z_upd), z_opt, loss, out

        def z_step_single(z1, z_opt1, dec_t, tgt1, m1, zr1):
            (loss, out), gz = jax.value_and_grad(
                total_loss_s, argnums=0, has_aux=True
            )(z1, dec_t, tgt1, m1, zr1)
            z_upd, z_opt1 = z_tx.update(gz, z_opt1, z1)
            return optax.apply_updates(z1, z_upd), z_opt1, loss, out

        # decoder params broadcast under vmap (in_axes=None): the z phase's
        # decode still runs as ONE batched conv with shared kernels, so
        # per-window z costs nothing extra over the batched formulation
        z_step_b = jax.vmap(z_step_single, in_axes=(0, 0, None, 0, 0, 0))

        def dec_step(z, dec_t, dec_opt):
            (loss, out), gd = jax.value_and_grad(
                total_loss, argnums=1, has_aux=True
            )(z, dec_t, targets, mask, z_reg_target)
            d_upd, dec_opt = dec_tx.update(gd, dec_opt, dec_t)
            return optax.apply_updates(dec_t, d_upd), dec_opt, loss, out

        def dec_step_single(z1, dec_t1, dec_opt1, tgt1, m1, zr1):
            (loss, out), gd = jax.value_and_grad(
                total_loss_s, argnums=1, has_aux=True
            )(z1, dec_t1, tgt1, m1, zr1)
            d_upd, dec_opt1 = dec_tx.update(gd, dec_opt1, dec_t1)
            return optax.apply_updates(dec_t1, d_upd), dec_opt1, loss, out

        dec_step_b = jax.vmap(dec_step_single, in_axes=(0, 0, 0, 0, 0, 0))

        def track(best, loss, out):
            """Best-so-far tracking (scalar batch-mean loss in the shared
            formulation; per-window (B,) losses under per_win — each
            reference window tracks its own minimum, :1753-1757)."""
            if not lat.track_best:
                return best
            best_loss, best_out = best
            better = loss < best_loss
            sel = _tree_where_b if per_win else _tree_where
            return (jnp.where(better, loss, best_loss),
                    sel(better, out, best_out))

        # The z-vs-decoder switch at prev_epochs
        # (seq_two_hier_sa_vae.py:1733-1751: iterations 0..prev_epochs step
        # Adam(z), the rest step Adam(decoder clone)) is STATIC config, so the
        # loop splits into two scans instead of a per-iteration lax.cond:
        # during the z phase the decoder params are a closure constant and
        # XLA's loop-invariant code motion hoists the mask+pool-fold weight
        # prep out of the loop entirely; each scan carries only its own
        # optimizer state.  The final iteration runs outside the scans — its
        # forward's outputs are the result (:1759-1780).
        n_scan = lat.opt_it - 1
        n_z = min(lat.prev_epochs + 1, n_scan) if lat.optimize_decoder \
            else n_scan

        if per_win:
            z_opt0 = jax.vmap(z_tx.init)(z0)
            big = jnp.full((B,), jnp.inf)
        else:
            z_opt0 = z_tx.init(z0)
            big = jnp.full((), jnp.inf)
        out0 = decode(wrap(train0), z0) if lat.track_best else None
        best0 = (big, out0) if lat.track_best else ()

        def z_body(carry, _):
            z, z_opt, best = carry
            if per_win:
                z, z_opt, loss_b, out = z_step_b(
                    z, z_opt, train0, targets, mask, z_reg_target)
                return (z, z_opt, track(best, loss_b, out)), jnp.mean(loss_b)
            z, z_opt, loss, out = z_step(z, z_opt, train0)
            return (z, z_opt, track(best, loss, out)), loss

        (z, z_opt, best), losses_z = jax.lax.scan(
            z_body, (z0, z_opt0, best0), None, length=n_z)

        def bcast_dec(t):
            return jax.tree.map(
                lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), t)

        if lat.optimize_decoder and n_scan > n_z:
            if per_win:
                dec_p0 = bcast_dec(train0)
                dec_opt0 = jax.vmap(dec_tx.init)(dec_p0)
            else:
                dec_p0, dec_opt0 = train0, dec_tx.init(train0)

            def dec_body(carry, _):
                dec_p, dec_opt, best = carry
                if per_win:
                    dec_p, dec_opt, loss_b, out = dec_step_b(
                        z, dec_p, dec_opt, targets, mask, z_reg_target)
                    return ((dec_p, dec_opt, track(best, loss_b, out)),
                            jnp.mean(loss_b))
                dec_p, dec_opt, loss, out = dec_step(z, dec_p, dec_opt)
                return (dec_p, dec_opt, track(best, loss, out)), loss

            (dec_p, dec_opt, best), losses_d = jax.lax.scan(
                dec_body, (dec_p0, dec_opt0, best0 if n_z == 0 else best),
                None, length=n_scan - n_z)
            losses = jnp.concatenate([losses_z, losses_d])
        else:
            dec_p, dec_opt = train0, None
            losses = losses_z

        # final iteration explicitly (phase is static too)
        if lat.optimize_decoder and (lat.opt_it - 1) > lat.prev_epochs:
            if dec_opt is None:
                if per_win:
                    dec_p = bcast_dec(dec_p)
                    dec_opt = jax.vmap(dec_tx.init)(dec_p)
                else:
                    dec_opt = dec_tx.init(dec_p)
            if per_win:
                dec_p, dec_opt, loss_last, last = dec_step_b(
                    z, dec_p, dec_opt, targets, mask, z_reg_target)
            else:
                dec_p, dec_opt, loss_last, last = dec_step(z, dec_p, dec_opt)
        elif per_win:
            z, z_opt, loss_last, last = z_step_b(
                z, z_opt, train0, targets, mask, z_reg_target)
        else:
            z, z_opt, loss_last, last = z_step(z, z_opt, dec_p)
        losses = jnp.concatenate(
            [losses, (jnp.mean(loss_last) if per_win else loss_last)[None]])
        if lat.track_best:
            best_loss, best_out = best
            better = loss_last < best_loss
            sel = _tree_where_b if per_win else _tree_where
            best_out = sel(better, last, best_out)
        else:
            best_out = last

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
