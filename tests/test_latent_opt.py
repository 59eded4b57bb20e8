"""Latent-optimization engine + application tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.apps.latent_opt import init_z, make_latent_optimizer
from hm_vae_tpu.apps.tasks import (
    LatentOptApps, completion_joint_mask, interpolation_mask,
)
from hm_vae_tpu.models.hm_vae import HMVAE
from hm_vae_tpu.ops import rotations as rot
from hm_vae_tpu.utils.config import Config, LatentOptConfig, ModelConfig

CFG = Config(
    model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                      train_seq_len=8),
    latent_opt=LatentOptConfig(opt_it=30, opt_lr=0.1, opt_step_size=15,
                               prev_epochs=15, reg_w=0.0, reg_w_decoder=1000.0,
                               optimize_decoder=True, interpolation_window=3),
)


def _model_and_params():
    model = HMVAE(CFG.model)
    x = jnp.zeros((1, 8, 24, 6))
    return model, model.init(jax.random.PRNGKey(0), x)


def _rand_rotmat_seq(key, T):
    aa = jax.random.normal(key, (T, 24, 3)) * 0.3
    return rot.aa_to_rotmat(aa)


def test_masks():
    m = interpolation_mask(8, 3)
    np.testing.assert_allclose(m, [1, 0, 0, 1, 0, 0, 1, 1])
    jm = completion_joint_mask("lower")
    assert jm.sum() == 12 and jm[12] == 1 and jm[0] == 0
    jm = completion_joint_mask("upper")
    assert jm[12] == 0 and jm[0] == 1


def test_solver_reduces_loss():
    model, params = _model_and_params()
    solve = make_latent_optimizer(model, CFG)
    mats = _rand_rotmat_seq(jax.random.PRNGKey(1), 8)[None]
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    targets = _targets_from_rotmat(mats)
    mask = jnp.ones((1, 8, 24))
    z = init_z(jax.random.PRNGKey(2), CFG, 1)
    zr = jax.tree.map(jnp.zeros_like, z)
    res = solve(params, targets, mask, z, zr)
    hist = np.asarray(res.loss_history)
    assert np.isfinite(hist).all()
    assert hist[-1] < hist[0] * 0.9, (hist[0], hist[-1])
    # best_loss <= all observed losses
    assert res.best_6d.shape == (1, 8, 24, 6)


def test_masked_region_influences_only_visible():
    """Solver must not receive signal from masked-out joints."""
    model, params = _model_and_params()
    solve = make_latent_optimizer(model, CFG)
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    m1 = _rand_rotmat_seq(jax.random.PRNGKey(1), 8)[None]
    m2 = np.asarray(m1).copy()
    # change only joint 23 (a leaf: its rotation moves no other joint's FK
    # position), and mask it out
    m2[:, :, 23] = np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(9), 8))[:, 23]
    mask = np.ones((1, 8, 24), np.float32)
    mask[:, :, 23] = 0.0
    z = init_z(jax.random.PRNGKey(2), CFG, 1)
    zr = jax.tree.map(jnp.zeros_like, z)
    r1 = solve(params, _targets_from_rotmat(m1), jnp.asarray(mask), z, zr)
    r2 = solve(params, _targets_from_rotmat(jnp.asarray(m2)), jnp.asarray(mask), z, zr)
    np.testing.assert_allclose(np.asarray(r1.last_6d), np.asarray(r2.last_6d),
                               atol=1e-5)


def test_interpolate_long_seq():
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seq = _rand_rotmat_seq(jax.random.PRNGKey(3), 20)  # 2 windows of 8
    out = apps.interpolate(seq, jax.random.PRNGKey(4))
    assert out["rot_6d"].shape == (16, 24, 6)
    assert out["pose"].shape == (16, 24, 3)
    # keyframes replaced with GT (replace_frame_with_gt default True)
    six_gt = rot.rotmat_to_rot6d(seq[:16])
    m = np.asarray(out["mask"])[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out["rot_6d"]) * m, np.asarray(six_gt) * m, atol=1e-5)


def test_complete_long_seq():
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seq = _rand_rotmat_seq(jax.random.PRNGKey(5), 17)  # windows: 0..7, 7..14
    out = apps.complete(seq, jax.random.PRNGKey(6), missing="lower")
    T_out = out["rot_6d"].shape[0]
    assert T_out == 15  # 8 + 7
    # visible (upper-body) joints replaced with GT
    six_gt = np.asarray(rot.rotmat_to_rot6d(seq))[:T_out]
    vis = completion_joint_mask("lower").astype(bool)
    np.testing.assert_allclose(
        np.asarray(out["rot_6d"])[1:, vis], six_gt[1:, vis], atol=1e-5)


def test_generate_long_seq():
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seed = _rand_rotmat_seq(jax.random.PRNGKey(7), 8)
    out = apps.generate(seed, jax.random.PRNGKey(8), num_windows=2, overlap=3)
    assert out["rot_6d"].shape[0] == 8 + 2 * 5
    assert np.isfinite(np.asarray(out["pose"])).all()


def test_interpolate_many_batches_across_sequences():
    """interpolate_many: windows of different-length sequences flatten into
    one padded batch; per-sequence outputs stitch back to n_i*W frames with
    keyframes pinned to GT (replace_frame_with_gt)."""
    import dataclasses

    model, params = _model_and_params()
    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=6, optimize_decoder=False,
        replace_frame_with_gt=True, interpolation_window=3))
    apps = LatentOptApps(model, params, cfg)
    W = 8
    lens = [W, 2 * W + 3, 3 * W]  # 1, 2, 3 windows
    seqs = [np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(30 + i), L))
            for i, L in enumerate(lens)]
    outs = apps.interpolate_many(seqs, jax.random.PRNGKey(5),
                                 pad_to_multiple=4)  # 6 windows -> pad to 8
    assert len(outs) == 3
    from hm_vae_tpu.apps.tasks import interpolation_mask
    from hm_vae_tpu.ops import rotations as rot
    key_idx = np.nonzero(interpolation_mask(W, 3))[0]
    for seq, out, L in zip(seqs, outs, lens):
        n = L // W
        assert out["rot_6d"].shape == (n * W, 24, 6)
        assert np.isfinite(out["pose"]).all()
        gt6 = np.asarray(rot.rotmat_to_rot6d(jnp.asarray(seq[: n * W])))
        for w in range(n):
            np.testing.assert_allclose(
                out["rot_6d"][w * W + key_idx], gt6[w * W + key_idx],
                atol=1e-5)


@pytest.mark.slow
def test_generate_many_matches_single_and_batches():
    """generate_many: with ONE seed it draws the same z stream as generate()
    (same fold_in, B=1), so outputs agree up to solver chaos — the two paths
    compute FK pose targets via fk_numpy vs the jitted FK (~1e-7 apart) and
    the Adam solve amplifies that; the seed portion must be exact."""
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seed = np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(7), 8))
    single = apps.generate(jnp.asarray(seed), jax.random.PRNGKey(8),
                           num_windows=2, overlap=3)
    [many_one] = apps.generate_many([seed], jax.random.PRNGKey(8),
                                    num_windows=2, overlap=3)
    np.testing.assert_allclose(np.asarray(single["rot_6d"])[:8],
                               many_one["rot_6d"][:8], atol=1e-6)
    np.testing.assert_allclose(np.asarray(single["rot_6d"]),
                               many_one["rot_6d"], atol=0.05)

    seeds = [np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(70 + i), 8))
             for i in range(3)]
    outs = apps.generate_many(seeds, jax.random.PRNGKey(9), num_windows=2,
                              overlap=3)
    assert len(outs) == 3
    for out in outs:
        assert out["rot_6d"].shape[0] == 8 + 2 * 5
        assert np.isfinite(out["pose"]).all()
    # different seeds produce different continuations
    assert not np.allclose(outs[0]["rot_6d"], outs[1]["rot_6d"])


def test_baselines():
    from hm_vae_tpu.apps.baselines import lerp_root_trajectory, slerp_rotations
    seq = np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(9), 10))
    mask = np.zeros(10, np.float32)
    mask[[0, 4, 9]] = 1
    out = slerp_rotations(seq, mask)
    # keyframes exact
    np.testing.assert_allclose(out[[0, 4, 9]], seq[[0, 4, 9]], atol=1e-5)
    eye = np.einsum("tjab,tjcb->tjac", out, out)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)

    trans = np.cumsum(np.random.default_rng(0).normal(size=(10, 3)), axis=0).astype(np.float32)
    lerp = lerp_root_trajectory(trans, mask)
    np.testing.assert_allclose(lerp[[0, 4, 9]], trans[[0, 4, 9]], atol=1e-6)
    np.testing.assert_allclose(lerp[2], trans[0] + (trans[4] - trans[0]) * 0.5, atol=1e-5)


def test_metrics():
    from hm_vae_tpu.apps.metrics import accel_error, mpjpe, pa_mpjpe
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(4, 24, 3)).astype(np.float32)
    assert float(mpjpe(jnp.asarray(gt), jnp.asarray(gt))) == 0.0
    # PA-MPJPE invariant to rigid transform of pred
    from scipy.spatial.transform import Rotation as R
    Rm = R.random(random_state=0).as_matrix().astype(np.float32)
    pred = gt @ Rm.T * 1.3 + np.array([1.0, 2.0, 3.0], np.float32)
    v = float(pa_mpjpe(jnp.asarray(pred), jnp.asarray(gt)))
    assert v < 1e-4, v
    seq = rng.normal(size=(10, 24, 3)).astype(np.float32)
    assert float(accel_error(jnp.asarray(seq), jnp.asarray(seq))) == 0.0


def test_interpolation_with_trajectory_loss():
    import dataclasses
    from hm_vae_tpu.models.trajectory import TrajectoryModel
    from hm_vae_tpu.utils.config import ModelConfig as MC

    cfg = dataclasses.replace(
        CFG, latent_opt=dataclasses.replace(
            CFG.latent_opt, optimize_trajectory=True, reg_w_trajectory=1.0,
            optimize_decoder=False, opt_it=10))
    model, params = _model_and_params()

    tcfg = MC(model_name="TrajectoryModel", latent_d=12, kernel_size=3,
              train_seq_len=8, trajectory_input_joint_pos=True)
    tmodel = TrajectoryModel(tcfg)
    tparams = tmodel.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 3)))
    ms = np.stack([np.zeros(579), np.ones(579)]).astype(np.float32)

    apps = LatentOptApps(model, params, cfg, trajectory=(tmodel, tparams, ms))
    assert apps._traj_solve is not None
    seq = _rand_rotmat_seq(jax.random.PRNGKey(3), 16)
    trans = np.cumsum(
        np.random.default_rng(0).normal(size=(16, 3)) * 0.01, axis=0
    ).astype(np.float32)
    out = apps.interpolate(seq, jax.random.PRNGKey(4),
                           root_trans=jnp.asarray(trans))
    assert out["rot_6d"].shape == (16, 24, 6)
    assert np.isfinite(np.asarray(out["loss_history"])).all()


@pytest.mark.slow
def test_interpolation_multi_restart():
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seq = _rand_rotmat_seq(jax.random.PRNGKey(11), 16)  # 2 windows
    out1 = apps.interpolate(seq, jax.random.PRNGKey(12), restarts=1)
    out3 = apps.interpolate(seq, jax.random.PRNGKey(12), restarts=3)
    assert out3["rot_6d"].shape == out1["rot_6d"].shape == (16, 24, 6)
    # best-of-3 restart final loss <= single restart's (same first init seed
    # is not guaranteed, so compare against the worst case: finiteness + shape)
    assert np.isfinite(np.asarray(out3["rot_6d"])).all()


@pytest.mark.slow
def test_final_loss_selection_consistency():
    """final_loss must rank restarts consistently with the masked objective."""
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    from hm_vae_tpu.apps.latent_opt import make_latent_optimizer, init_z
    model, params = _model_and_params()
    solve = make_latent_optimizer(model, CFG)
    mats = _rand_rotmat_seq(jax.random.PRNGKey(13), 8)[None]
    targets = _targets_from_rotmat(jnp.concatenate([mats, mats], 0))
    mask = jnp.ones((2, 8, 24))
    z = init_z(jax.random.PRNGKey(14), CFG, 2)
    zr = jax.tree.map(jnp.zeros_like, z)
    res = solve(params, targets, mask, z, zr)
    # recompute the weighted masked loss by hand for sample 0
    l = 0.0
    for w, field, out in ((1.0, "rot_6d", res.last_6d),
                          (1.0, "rot_mat", res.last_rotmat),
                          (10.0, "pose", res.last_pose)):
        l += w * float(jnp.mean((out[0] - targets[field][0]) ** 2))
    np.testing.assert_allclose(float(res.final_loss[0]), l, rtol=1e-4)


def test_complete_accepts_numpy_input():
    """The eval CLI feeds host numpy rotmats; completion must accept them
    (regression: rot_mat passed through as numpy broke .at[] stitching)."""
    model, params = _model_and_params()
    apps = LatentOptApps(model, params, CFG)
    seq = np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(21), 17))
    out = apps.complete(seq, jax.random.PRNGKey(22), missing="lower")
    assert out["rot_6d"].shape[0] == 15
    out2 = apps.interpolate(np.asarray(seq[:16]), jax.random.PRNGKey(23))
    assert out2["rot_6d"].shape == (16, 24, 6)


def test_completion_prev_epochs_is_100():
    """Completion phase-switches at prev_epochs=100 while the other tasks use
    50 (seq_two_hier_sa_vae.py:1731 vs :1206/:1403): the apps runner must build
    a separate completion solver whenever the two values differ."""
    import dataclasses

    model, params = _model_and_params()
    # defaults: prev_epochs=50, prev_epochs_completion=100 -> distinct solvers
    cfg = dataclasses.replace(CFG, latent_opt=LatentOptConfig(
        opt_it=4, optimize_decoder=True))
    apps = LatentOptApps(model, params, cfg)
    assert apps.solve_completion is not apps.solve

    # equal values -> the single solver is shared
    cfg_eq = dataclasses.replace(cfg, latent_opt=dataclasses.replace(
        cfg.latent_opt, prev_epochs_completion=cfg.latent_opt.prev_epochs))
    apps_eq = LatentOptApps(model, params, cfg_eq)
    assert apps_eq.solve_completion is apps_eq.solve


def test_single_window_apps_shapes_and_masking():
    """complete_single_window / interpolate_single_window: batched one-window
    solves across sequences (the reference's intended single-window API,
    trainer_motion_vae.py:214-229)."""
    import dataclasses

    model, params = _model_and_params()
    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=6, optimize_decoder=False,
        replace_part_with_gt=True, replace_frame_with_gt=True))
    apps = LatentOptApps(model, params, cfg)
    B, W = 3, 8
    mats = jnp.stack([_rand_rotmat_seq(jax.random.PRNGKey(10 + i), W)
                      for i in range(B)])

    masks = np.ones((B, W, 24), np.float32)
    masks[:, :, :8] = 0.0  # same 8 joints missing everywhere
    out = apps.complete_single_window(mats, masks, jax.random.PRNGKey(3))
    assert out["rot_6d"].shape == (B, W, 24, 6)
    assert out["pose"].shape == (B, W, 24, 3)
    # visible entries replaced with GT exactly
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    tgt = _targets_from_rotmat(mats)
    vis = np.asarray(out["rot_6d"])[:, :, 8:]
    np.testing.assert_allclose(vis, np.asarray(tgt["rot_6d"])[:, :, 8:],
                               atol=1e-6)

    out_i = apps.interpolate_single_window(mats, jax.random.PRNGKey(4))
    assert out_i["rot_mat"].shape == (B, W, 24, 3, 3)
    # keyframes pinned to GT
    key_frames = np.nonzero(interpolation_mask(W, 3))[0]
    np.testing.assert_allclose(
        np.asarray(out_i["rot_6d"])[:, key_frames],
        np.asarray(tgt["rot_6d"])[:, key_frames], atol=1e-6)


def test_complete_many_batches_across_sequences():
    """complete_many: same contract as per-sequence complete(), solving one
    batched window-index at a time across sequences of different lengths."""
    import dataclasses

    model, params = _model_and_params()
    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=6, optimize_decoder=False,
        replace_part_with_gt=True))
    apps = LatentOptApps(model, params, cfg)
    W = 8
    # lengths: 1, 2 and 3 windows at stride W-1
    lens = [W, W + (W - 1), W + 2 * (W - 1)]
    seqs = [np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(40 + i), L))
            for i, L in enumerate(lens)]
    outs = apps.complete_many(seqs, jax.random.PRNGKey(5), missing="lower")
    assert len(outs) == 3
    for L, out in zip(lens, outs):
        assert out["pose"].shape == (L, 24, 3)
        assert np.isfinite(np.asarray(out["pose"])).all()
    # visible (upper-body) joints replaced with GT on every window
    from hm_vae_tpu.apps.tasks import completion_joint_mask
    jm = completion_joint_mask("lower")
    vis = np.nonzero(jm)[0]
    from hm_vae_tpu.ops import rotations as rot
    for seq, out in zip(seqs, outs):
        T_out = out["rot_6d"].shape[0]
        gt6 = np.asarray(rot.rotmat_to_rot6d(jnp.asarray(seq[:T_out])))
        np.testing.assert_allclose(
            np.asarray(out["rot_6d"])[:, vis], gt6[:, vis], atol=1e-5)


def test_complete_many_rejects_short_sequences():
    """A sequence shorter than one window cannot produce any output; the
    call must fail loudly (naming the offender) instead of crashing with a
    broadcast error or silently returning None for that slot."""
    import dataclasses

    import pytest

    model, params = _model_and_params()
    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=4, optimize_decoder=False))
    apps = LatentOptApps(model, params, cfg)
    W = 8
    seqs = [np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(1), W + 2)),
            np.asarray(_rand_rotmat_seq(jax.random.PRNGKey(2), W - 3))]
    with pytest.raises(ValueError, match=r"sequences \[1\].*shorter"):
        apps.complete_many(seqs, jax.random.PRNGKey(5), missing="lower")


@pytest.mark.slow
def test_per_window_solve_matches_independent_single_window_solves():
    """per_window_decoder=True (default): a batched solve is EXACTLY B
    independent per-window solves — own z trajectory, own decoder clone +
    Adam state per window, the reference's per-window-loop semantics
    (seq_two_hier_sa_vae.py:1343-1345, :1685-1687).  Verified by comparing
    each window of a B=2 batched solve against its own B=1 solve.  (A gentle
    constant lr keeps Adam from amplifying vmap-batching reassociation noise.)
    """
    import dataclasses

    from hm_vae_tpu.apps.tasks import _targets_from_rotmat

    model, params = _model_and_params()
    lat = dataclasses.replace(CFG.latent_opt, opt_it=20, prev_epochs=8,
                              opt_lr=0.02, opt_lr_policy="constant")
    solve = make_latent_optimizer(model, CFG, lat=lat)
    mats = [_rand_rotmat_seq(jax.random.PRNGKey(k), 8)[None] for k in (1, 2)]
    both = jnp.concatenate(mats)
    mask_b = jnp.ones((2, 8, 24))
    z = init_z(jax.random.PRNGKey(3), CFG, 2)
    zr = jax.tree.map(jnp.zeros_like, z)
    res_b = solve(params, _targets_from_rotmat(both), mask_b, z, zr)
    assert res_b.final_loss.shape == (2,)

    for i, m in enumerate(mats):
        z1 = jax.tree.map(lambda x: x[i : i + 1], z)
        res1 = solve(params, _targets_from_rotmat(m), jnp.ones((1, 8, 24)),
                     z1, jax.tree.map(jnp.zeros_like, z1))
        np.testing.assert_allclose(np.asarray(res_b.last_6d[i]),
                                   np.asarray(res1.last_6d[0]), atol=5e-3)
        np.testing.assert_allclose(float(res_b.final_loss[i]),
                                   float(res1.final_loss[0]), rtol=0.05)


@pytest.mark.slow
def test_shared_decoder_mode_still_available():
    """per_window_decoder=False restores the round-2 shared-clone batched
    formulation (documented throughput trade)."""
    import dataclasses

    from hm_vae_tpu.apps.tasks import _targets_from_rotmat

    model, params = _model_and_params()
    lat = dataclasses.replace(CFG.latent_opt, per_window_decoder=False)
    solve = make_latent_optimizer(model, CFG, lat=lat)
    mats = jnp.concatenate(
        [_rand_rotmat_seq(jax.random.PRNGKey(k), 8)[None] for k in (4, 5)])
    z = init_z(jax.random.PRNGKey(6), CFG, 2)
    res = solve(params, _targets_from_rotmat(mats), jnp.ones((2, 8, 24)), z,
                jax.tree.map(jnp.zeros_like, z))
    hist = np.asarray(res.loss_history)
    assert np.isfinite(hist).all() and hist[-1] < hist[0]


@pytest.mark.parametrize("scope", ["last_conv", "heads"])
@pytest.mark.parametrize("per_win", [True, False])
def test_finetune_scope_subtree(scope, per_win):
    """Restricted fine-tune scopes run in both solver formulations and still
    optimize: the dec phase keeps reducing the loss below the z phase's end,
    and the whole trajectory stays finite."""
    import dataclasses

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope=scope, per_window_decoder=per_win))
    model, params = _model_and_params()
    solve = make_latent_optimizer(model, cfg)
    mats = _rand_rotmat_seq(jax.random.PRNGKey(3), 8)[None]
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    targets = _targets_from_rotmat(mats)
    mask = jnp.ones((2, 8, 24))
    tgt2 = jax.tree.map(lambda x: jnp.concatenate([x, x]), targets)
    z = init_z(jax.random.PRNGKey(4), cfg, 2)
    zr = jax.tree.map(jnp.zeros_like, z)
    res = solve(params, tgt2, mask, z, zr)
    hist = np.asarray(res.loss_history)
    assert np.isfinite(hist).all()
    n_z = cfg.latent_opt.prev_epochs + 1
    assert hist[-1] < hist[n_z - 1], (hist[n_z - 1], hist[-1])
    assert hist[-1] < hist[0] * 0.9


def test_finetune_scope_full_matches_default():
    """finetune_scope='full' is the default path — bit-identical results."""
    import dataclasses

    model, params = _model_and_params()
    mats = _rand_rotmat_seq(jax.random.PRNGKey(5), 8)[None]
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    targets = _targets_from_rotmat(mats)
    mask = jnp.ones((1, 8, 24))
    z = init_z(jax.random.PRNGKey(6), CFG, 1)
    zr = jax.tree.map(jnp.zeros_like, z)
    r1 = make_latent_optimizer(model, CFG)(params, targets, mask, z, zr)
    cfg2 = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope="full"))
    r2 = make_latent_optimizer(model, cfg2)(params, targets, mask, z, zr)
    np.testing.assert_array_equal(np.asarray(r1.last_6d),
                                  np.asarray(r2.last_6d))


def test_finetune_scope_rejects_unknown():
    import dataclasses

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope="nope"))
    model, params = _model_and_params()
    solve = make_latent_optimizer(model, cfg)
    mats = _rand_rotmat_seq(jax.random.PRNGKey(7), 8)[None]
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    targets = _targets_from_rotmat(mats)
    mask = jnp.ones((1, 8, 24))
    z = init_z(jax.random.PRNGKey(8), cfg, 1)
    with pytest.raises(ValueError, match="finetune_scope"):
        solve(params, targets, mask, z, jax.tree.map(jnp.zeros_like, z))


def test_lora_module_zero_adapter_is_exact():
    """SkeletonConv.lora_rank with lora_a == 0 (the solve's fresh-adapter
    init) is function-IDENTICAL to the base conv: conv(x, w) + A @ conv(x, B)
    with A = 0 adds exact zeros (models/hm_vae.py)."""
    import dataclasses

    from flax import traverse_util

    model, params = _model_and_params()
    model_l = HMVAE(dataclasses.replace(CFG.model, lora_rank=3))
    params_l = model_l.init(jax.random.PRNGKey(9), jnp.zeros((1, 8, 24, 6)))
    # transplant the BASE weights (keep model_l's fresh lora leaves)
    flat = traverse_util.flatten_dict(params_l["params"])
    for pth, v in traverse_util.flatten_dict(params["params"]).items():
        flat[pth] = v
    merged = {"params": traverse_util.unflatten_dict(flat)}
    z = init_z(jax.random.PRNGKey(10), CFG, 2)
    base = model.apply(params, z, method=HMVAE.decode)
    lora = model_l.apply(merged, z, method=HMVAE.decode)
    np.testing.assert_allclose(np.asarray(base), np.asarray(lora),
                               rtol=0, atol=0)


def test_lora_reg_gram_identity():
    """_lora_reg's Gram-identity term equals the materialized
    mean((A @ B)^2), and direct leaves keep the per-tensor mean((w-w0)^2)."""
    from hm_vae_tpu.apps.latent_opt import _lora_reg

    k = jax.random.PRNGKey(0)
    ka, kb, kc, kd = jax.random.split(k, 4)
    A = jax.random.normal(ka, (7, 3))
    B = jax.random.normal(kb, (3, 5, 2))
    bias = jax.random.normal(kc, (7,))
    bias0 = jax.random.normal(kd, (7,))
    tree = {"conv_0": {"lora_a": A, "lora_b": B, "bias": bias}}
    tree0 = {"conv_0": {"lora_a": jnp.zeros_like(A),
                        "lora_b": B, "bias": bias0}}
    got = float(_lora_reg(tree, tree0))
    delta = A @ B.reshape(3, -1)
    want = float(jnp.mean(delta ** 2) + jnp.mean((bias - bias0) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.parametrize("per_win", [True, False])
def test_lora_scope_z_phase_matches_full_and_optimizes(per_win):
    """finetune_scope='lora': the z phase is numerically the full-scope z
    phase (adapters start at exact zero delta, like a fresh deepcopy), and
    the rank-r decoder phase still reduces the loss below the z phase's end
    — with KBs of per-window state instead of the full decoder clone."""
    import dataclasses

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope="lora", lora_rank=4,
        per_window_decoder=per_win))
    cfg_full = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope="full", per_window_decoder=per_win))
    model, params = _model_and_params()
    mats = _rand_rotmat_seq(jax.random.PRNGKey(11), 8)[None]
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    targets = _targets_from_rotmat(mats)
    tgt2 = jax.tree.map(lambda x: jnp.concatenate([x, x]), targets)
    mask = jnp.ones((2, 8, 24))
    z = init_z(jax.random.PRNGKey(12), cfg, 2)
    zr = jax.tree.map(jnp.zeros_like, z)
    res = make_latent_optimizer(model, cfg)(params, tgt2, mask, z, zr)
    res_f = make_latent_optimizer(model, cfg_full)(params, tgt2, mask, z, zr)
    hist = np.asarray(res.loss_history)
    hist_f = np.asarray(res_f.loss_history)
    assert np.isfinite(hist).all()
    n_z = cfg.latent_opt.prev_epochs + 1
    np.testing.assert_allclose(hist[:n_z], hist_f[:n_z], rtol=1e-5)
    assert hist[-1] < hist[n_z - 1], (hist[n_z - 1], hist[-1])
    assert hist[-1] < hist[0] * 0.9


def test_lora_rejects_zero_rank():
    import dataclasses

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, finetune_scope="lora", lora_rank=0))
    model, _ = _model_and_params()
    with pytest.raises(ValueError, match="lora_rank"):
        make_latent_optimizer(model, cfg)


@pytest.mark.slow
def test_mesh_sharded_lora_solve_matches_unsharded():
    """The GSPMD data-parallel eval path under finetune_scope='lora': the
    per-window adapter states shard over the data axis like any other
    per-window leaf, and the sharded solve reproduces the single-device
    result within the iterative chaos floor (see the full-scope test below
    for the tolerance calibration)."""
    import dataclasses

    from hm_vae_tpu.parallel import sharding as sh

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=4, prev_epochs=1, opt_step_size=1,
        finetune_scope="lora", lora_rank=4))
    model, params = _model_and_params()
    ref = LatentOptApps(model, params, cfg)
    mesh = sh.make_mesh(8, model_parallel=1)
    dp = LatentOptApps(model, params, cfg, mesh=mesh)
    seq = _rand_rotmat_seq(jax.random.PRNGKey(3), 26)  # 3 windows of 8
    out_ref = ref.interpolate(seq, jax.random.PRNGKey(4))
    out_dp = dp.interpolate(seq, jax.random.PRNGKey(4))
    for k in ("rot_6d", "rot_mat", "pose"):
        np.testing.assert_allclose(np.asarray(out_dp[k]),
                                   np.asarray(out_ref[k]),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_mesh_sharded_solve_matches_unsharded():
    """LatentOptApps(mesh=...): the window batch shards over the data axis
    under GSPMD and reproduces the single-device result (windows are
    independent solves).  A 3-window sequence exercises the pad-by-cycling
    path (3 -> 8 over 8 devices); a 2-sequence interpolate_many exercises
    the divisible path (its own pad_to_multiple=8).

    Tolerances are tight because the config runs FEW optimizer steps: the
    sharded and unsharded programs are semantically identical but compile to
    different instruction orders, and the iterative solve amplifies that
    last-ulp noise chaotically (measured: 4e-7 after 2 steps, 7e-4 after 8,
    1e-1 after 30 — the same chaos floor the reference exhibits under its
    own 1-ulp self-perturbation, PARITY.md).  Quality-level equality at the
    production step count is covered by the full-split A/B in BASELINE.md.
    """
    import dataclasses

    from hm_vae_tpu.parallel import sharding as sh

    cfg = dataclasses.replace(CFG, latent_opt=dataclasses.replace(
        CFG.latent_opt, opt_it=2, prev_epochs=1, opt_step_size=1))
    model, params = _model_and_params()
    ref = LatentOptApps(model, params, cfg)
    mesh = sh.make_mesh(8, model_parallel=1)
    dp = LatentOptApps(model, params, cfg, mesh=mesh)
    assert dp._bsh is not None and dp._n_data == 8

    seq = _rand_rotmat_seq(jax.random.PRNGKey(3), 26)  # 3 windows of 8
    out_ref = ref.interpolate(seq, jax.random.PRNGKey(4))
    out_dp = dp.interpolate(seq, jax.random.PRNGKey(4))
    for k in ("rot_6d", "rot_mat", "pose"):
        np.testing.assert_allclose(np.asarray(out_dp[k]),
                                   np.asarray(out_ref[k]),
                                   rtol=1e-5, atol=1e-5)

    seqs = [_rand_rotmat_seq(jax.random.PRNGKey(11), 16),
            _rand_rotmat_seq(jax.random.PRNGKey(12), 24)]
    many_ref = ref.interpolate_many(seqs, jax.random.PRNGKey(13),
                                    pad_to_multiple=8)
    many_dp = dp.interpolate_many(seqs, jax.random.PRNGKey(13),
                                  pad_to_multiple=8)
    for r, d in zip(many_ref, many_dp):
        np.testing.assert_allclose(np.asarray(d["pose"]),
                                   np.asarray(r["pose"]),
                                   rtol=1e-5, atol=1e-5)

    # the solve really dispatched over all 8 devices
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat

    tgt = _targets_from_rotmat(_rand_rotmat_seq(
        jax.random.PRNGKey(14), 8)[None].repeat(8, axis=0))
    mask = jnp.ones((8, 8, 24))
    z = init_z(jax.random.PRNGKey(15), cfg, 8)
    res = dp._dispatch(dp.solve, tgt, mask, z,
                       jax.tree.map(jnp.zeros_like, z))
    assert len(res.last_6d.sharding.device_set) == 8


def test_bf16_clone_solve_tracks_f32():
    """opt_param_dtype=bfloat16 stores the per-window decoder CLONE in bf16
    (stochastic-rounding write-back) — the solve must converge to the same
    neighbourhood as the f32 clone: finite history, comparable final loss,
    and close masked-loss outputs."""
    import dataclasses

    model, params = _model_and_params()
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    mats = _rand_rotmat_seq(jax.random.PRNGKey(1), 8)[None]
    targets = _targets_from_rotmat(mats)
    mask = np.ones((1, 8, 24), np.float32)
    mask[:, 2:6, :] = 0.0
    z = init_z(jax.random.PRNGKey(2), CFG, 1)
    zr = jax.tree.map(jnp.zeros_like, z)

    def run(dtype):
        lat = dataclasses.replace(CFG.latent_opt, opt_param_dtype=dtype,
                                  opt_moment_dtype=dtype
                                  if dtype == "bfloat16" else "float32")
        res = make_latent_optimizer(model, CFG, lat=lat)(
            params, targets, jnp.asarray(mask), z, zr)
        return np.asarray(res.loss_history), np.asarray(res.final_loss)

    h32, f32_loss = run("float32")
    h16, bf16_loss = run("bfloat16")
    assert np.isfinite(h16).all()
    # both descend, and the bf16 clone lands within 10% of the f32 objective
    assert h16[-1] < h16[0] * 0.9
    assert abs(h16[-1] - h32[-1]) < 0.10 * h32[-1], (h16[-1], h32[-1])
    assert abs(bf16_loss - f32_loss).max() < 0.15 * abs(f32_loss).max()


def test_bf16_clone_rejects_unknown_dtype():
    import dataclasses

    model, params = _model_and_params()
    lat = dataclasses.replace(CFG.latent_opt, opt_param_dtype="float64")
    with pytest.raises(ValueError):
        make_latent_optimizer(model, CFG, lat=lat)


def test_bf16_stored_checkpoint_under_f32_solve():
    """A bf16-STORED checkpoint (optim.param_dtype training mode) under the
    default f32 solve must up-cast the clone once — otherwise apply_updates'
    round-to-nearest cast silently swallows sub-ulp fine-tune steps."""
    model, params = _model_and_params()
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    solve = make_latent_optimizer(model, CFG)
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat
    mats = _rand_rotmat_seq(jax.random.PRNGKey(1), 8)[None]
    t = _targets_from_rotmat(mats)
    z = init_z(jax.random.PRNGKey(2), CFG, 1)
    zr = jax.tree.map(jnp.zeros_like, z)
    res = solve(params16, t, jnp.ones((1, 8, 24)), z, zr)
    h = np.asarray(res.loss_history)
    assert np.isfinite(h).all() and h[-1] < h[0] * 0.9, (h[0], h[-1])
