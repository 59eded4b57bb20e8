"""Compact conv-weight layout: function-exactness vs the dense layout.

The compact layout (models/param_layout.py) stores only mask-live conv weight
entries.  Everything the function can observe — outputs, gradients of live
entries, Adam trajectories — must match the dense layout exactly; these tests
pin that, plus the conversion round trips and the cross-layout checkpoint
load path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from hm_vae_tpu.models import param_layout as pl
from hm_vae_tpu.models.hm_vae import HMVAE
from hm_vae_tpu.models.structure import get_structure
from hm_vae_tpu.train.losses import hmvae_forward
from hm_vae_tpu.train.optim import make_optimizer
from hm_vae_tpu.utils.config import Config, LossConfig, ModelConfig, OptimConfig

CFG_D = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                    train_seq_len=8)
CFG_C = dataclasses.replace(CFG_D, param_layout="compact")
# flagship shapes exercise the mask.all() fast path on the deep levels
FLAG_D = ModelConfig()
FLAG_C = dataclasses.replace(FLAG_D, param_layout="compact")


def _x(key, cfg, B=2):
    return jax.random.normal(key, (B, cfg.train_seq_len, cfg.n_joints,
                                   cfg.input_dim))


def test_validate_layout_rejects_unknown():
    with pytest.raises(ValueError):
        pl.validate_layout("sparse")
    with pytest.raises(ValueError):
        HMVAE(dataclasses.replace(CFG_D, param_layout="bogus")).init(
            jax.random.PRNGKey(0), _x(jax.random.PRNGKey(1), CFG_D))


def test_compact_meta_counts():
    st = get_structure(FLAG_D)
    spec = st.encoder_levels[0].conv
    meta = pl.compact_meta(spec)
    assert meta.n_live == int(spec.mask.sum())
    # deepest level is fully dense -> stays a plain dense "weight"
    deep = st.encoder_levels[-1].conv
    assert deep.mask.all() and not pl.is_compact_spec(deep, "compact")
    assert pl.is_compact_spec(spec, "compact")


def test_expand_contract_round_trip():
    st = get_structure(FLAG_D)
    spec = st.encoder_levels[0].conv
    rng = np.random.RandomState(0)
    w = rng.randn(spec.out_channels, spec.in_channels,
                  spec.kernel_size).astype(np.float32)
    wc = pl.compact_from_dense(w, spec)
    dense = pl.dense_from_compact(wc, spec)
    # live entries identical, dead entries exactly zero
    mask = spec.mask.astype(bool)
    np.testing.assert_array_equal(dense[mask], w[mask])
    assert (dense[~mask] == 0).all()
    # expander matches the numpy densify, and its VJP is the contract gather
    ex = pl.expander(spec)
    np.testing.assert_array_equal(np.asarray(ex(jnp.asarray(wc))), dense)
    g = rng.randn(*dense.shape).astype(np.float32)
    (gc,) = jax.vjp(ex, jnp.asarray(wc))[1](jnp.asarray(g))
    np.testing.assert_array_equal(np.asarray(gc), g[mask])


@pytest.mark.parametrize("cfg_d,cfg_c", [(CFG_D, CFG_C), (FLAG_D, FLAG_C)])
def test_apply_bitwise_equal_across_layouts(cfg_d, cfg_c):
    key = jax.random.PRNGKey(0)
    model_d, model_c = HMVAE(cfg_d), HMVAE(cfg_c)
    x = _x(jax.random.PRNGKey(1), cfg_d)
    vars_d = model_d.init(key, x)
    vars_c = pl.convert_conv_params(vars_d, cfg_d, "compact")
    stats_d, out_d = model_d.apply(vars_d, x)
    stats_c, out_c = model_c.apply(vars_c, x)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_c))
    for a, b in zip(stats_d, stats_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_gradients_equal_at_live_entries():
    cfg = Config(model=CFG_D, loss=LossConfig(iteration_interval=5))
    cfg_c = dataclasses.replace(cfg, model=CFG_C)
    model_d, model_c = HMVAE(CFG_D), HMVAE(CFG_C)
    key = jax.random.PRNGKey(0)
    x6d = _x(jax.random.PRNGKey(1), CFG_D)
    from hm_vae_tpu.ops import rotations as rot

    aa = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    batch = {"rot_6d": rot.rotmat_to_rot6d(mats), "rot_mat": mats}
    vars_d = model_d.init(key, x6d)
    vars_c = pl.convert_conv_params(vars_d, CFG_D, "compact")
    rng = jax.random.PRNGKey(3)

    def loss_d(p):
        return hmvae_forward(model_d, p, batch, rng, 0, cfg, sample=False)[0]

    def loss_c(p):
        return hmvae_forward(model_c, p, batch, rng, 0, cfg_c, sample=False)[0]

    gd = jax.grad(loss_d)(vars_d)
    gc = jax.grad(loss_c)(vars_c)
    # compact grads == dense grads gathered at the live entries
    gd_as_c = pl.convert_conv_params(
        jax.tree.map(np.asarray, gd), CFG_D, "compact")
    for top in ("encoder", "decoder"):
        flat_c = jax.tree_util.tree_leaves_with_path(gc["params"][top])
        flat_d = jax.tree_util.tree_leaves_with_path(gd_as_c["params"][top])
        assert len(flat_c) == len(flat_d)
        for (pc, lc), (pd, ld) in zip(flat_c, flat_d):
            assert str(pc) == str(pd)
            np.testing.assert_allclose(np.asarray(lc), np.asarray(ld),
                                       atol=1e-6, rtol=1e-5,
                                       err_msg=str(pc))


@pytest.mark.slow
def test_train_trajectory_identical():
    """5 Adam steps: losses and live-entry params match the dense layout."""
    cfg = Config(model=CFG_D, loss=LossConfig(iteration_interval=3),
                 optim=OptimConfig(lr=1e-3, batch_size=2))
    cfg_c = dataclasses.replace(cfg, model=CFG_C)
    from hm_vae_tpu.ops import rotations as rot

    aa = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 24, 3)) * 0.3
    mats = rot.aa_to_rotmat(aa)
    batch = {"rot_6d": rot.rotmat_to_rot6d(mats), "rot_mat": mats}

    def run(model, c, variables):
        tx = make_optimizer(c.optim)
        params = variables
        opt = tx.init(params)
        losses = []
        for i in range(5):
            def loss_fn(p):
                return hmvae_forward(model, p, batch, jax.random.PRNGKey(9),
                                     i, c, sample=False)[0]
            l, g = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(g, opt, params)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
        return losses, params

    v_d = HMVAE(CFG_D).init(jax.random.PRNGKey(0), _x(jax.random.PRNGKey(1),
                                                      CFG_D))
    v_c = pl.convert_conv_params(v_d, CFG_D, "compact")
    losses_d, p_d = run(HMVAE(CFG_D), cfg, v_d)
    losses_c, p_c = run(HMVAE(CFG_C), cfg_c, v_c)
    np.testing.assert_allclose(losses_d, losses_c, rtol=1e-6)
    p_d_as_c = pl.convert_conv_params(jax.tree.map(np.asarray, p_d),
                                      CFG_D, "compact")
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(p_d_as_c),
            jax.tree_util.tree_leaves_with_path(p_c)):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-6, rtol=1e-5, err_msg=str(pa))


def test_torch_round_trip_compact():
    from hm_vae_tpu.utils.torch_import import (
        export_hmvae_params, import_hmvae_params)

    v_c = HMVAE(CFG_C).init(jax.random.PRNGKey(0),
                            _x(jax.random.PRNGKey(1), CFG_C))
    sd = export_hmvae_params(jax.tree.map(np.asarray, v_c), CFG_C)
    back = import_hmvae_params(sd, CFG_C)
    assert pl.params_layout(back) == "compact"
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(v_c),
            jax.tree_util.tree_leaves_with_path(back)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_extra_conv_layouts_equal():
    """extra_conv=1 adds stride-1 convs on both sides (their specs are in the
    conversion map too); apply equality must hold."""
    cfg_d = dataclasses.replace(CFG_D, extra_conv=1)
    cfg_c = dataclasses.replace(cfg_d, param_layout="compact")
    x = _x(jax.random.PRNGKey(1), cfg_d)
    v_d = HMVAE(cfg_d).init(jax.random.PRNGKey(0), x)
    v_c = pl.convert_conv_params(v_d, cfg_d, "compact")
    _, out_d = HMVAE(cfg_d).apply(v_d, x)
    _, out_c = HMVAE(cfg_c).apply(v_c, x)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_c))


def test_compact_init_respects_block_bounds():
    """weight_c init draws U(-b_e, b_e) with b_e the out-edge's masked-slice
    kaiming bound (skeleton.py:70-89), exactly like the dense init's live
    entries."""
    st = get_structure(FLAG_D)
    v = HMVAE(FLAG_C).init(jax.random.PRNGKey(0),
                           _x(jax.random.PRNGKey(1), FLAG_C))
    w = np.asarray(v["params"]["encoder"]["conv_0"]["weight_c"])
    spec = st.encoder_levels[0].conv
    meta = pl.compact_meta(spec)
    assert w.shape == (meta.n_live, spec.kernel_size)
    b = meta.row_bounds[:, None]
    assert (np.abs(w) <= b + 1e-7).all()
    # draws actually fill the band (not degenerate)
    assert (np.abs(w) > 0.5 * b).mean() > 0.3


def test_trajectory_model_layouts_equal():
    from hm_vae_tpu.models.trajectory import TrajectoryModel

    cfg_d = dataclasses.replace(CFG_D, model_name="TrajectoryModel",
                                train_seq_len=16)
    cfg_c = dataclasses.replace(cfg_d, param_layout="compact")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24, 3))
    v_d = TrajectoryModel(cfg_d).init(jax.random.PRNGKey(0), x)
    v_c = pl.convert_conv_params(v_d, cfg_d, "compact")
    out_d = TrajectoryModel(cfg_d).apply(v_d, x)
    out_c = TrajectoryModel(cfg_c).apply(v_c, x)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_c))


def test_latent_opt_solver_equal_across_layouts():
    """The two-scan latent-opt solver (incl. per-window decoder clone +
    custom_vjp weight expansion under vmap) produces the same loss under
    either layout at a non-chaotic lr."""
    from hm_vae_tpu.apps.latent_opt import init_z, make_latent_optimizer
    from hm_vae_tpu.apps.tasks import _targets_from_rotmat, interpolation_mask
    from hm_vae_tpu.ops import rotations as rot
    from hm_vae_tpu.utils.config import LatentOptConfig

    lo = LatentOptConfig(opt_it=6, prev_epochs=3, optimize_decoder=True,
                         opt_lr=1e-3, opt_step_size=3,
                         interpolation_window=4, per_window_decoder=True)
    cfg = Config(model=CFG_D, latent_opt=lo)
    cfg_c = dataclasses.replace(cfg, model=CFG_C)
    v_d = HMVAE(CFG_D).init(jax.random.PRNGKey(0),
                            _x(jax.random.PRNGKey(1), CFG_D))
    v_c = pl.convert_conv_params(v_d, CFG_D, "compact")
    B, T = 3, CFG_D.train_seq_len
    aa = jax.random.normal(jax.random.PRNGKey(3), (B, T, 24, 3)) * 0.3
    targets = _targets_from_rotmat(rot.aa_to_rotmat(aa))
    tmask = np.asarray(interpolation_mask(T, 4))
    mask = jnp.asarray(np.tile(tmask[None, :, None], (B, 1, 24)))
    z = init_z(jax.random.PRNGKey(4), cfg, B)
    zr = jax.tree.map(jnp.zeros_like, z)
    res_d = make_latent_optimizer(HMVAE(CFG_D), cfg)(
        v_d, targets, mask, z, zr)
    res_c = make_latent_optimizer(HMVAE(CFG_C), cfg_c)(
        v_c, targets, mask, z, zr)
    np.testing.assert_allclose(np.asarray(res_d.final_loss),
                               np.asarray(res_c.final_loss),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(res_d.last_6d),
                               np.asarray(res_c.last_6d),
                               rtol=1e-4, atol=1e-5)


def test_cross_layout_checkpoint_load(tmp_path):
    """A dense-trained checkpoint loads into a compact-config Trainer (and
    vice versa) through load_params' layout fallback."""
    from hm_vae_tpu.train.trainer import Trainer

    cfg = Config(model=CFG_D, optim=OptimConfig(batch_size=2),
                 data=dataclasses.replace(
                     Config().data, synthetic=True, synthetic_num_seqs=4))
    out_d = tmp_path / "dense"
    tr_d = Trainer(cfg, output_dir=str(out_d))
    path = tr_d.save(step=7)

    cfg_c = dataclasses.replace(cfg, model=CFG_C)
    tr_c = Trainer(cfg_c, output_dir=str(tmp_path / "compact"))
    tr_c.load_params(path)
    want = pl.convert_conv_params(
        jax.tree.map(np.asarray, tr_d.state.params), CFG_D, "compact")
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(tr_c.state.params)):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))

    # and back: compact checkpoint -> dense trainer
    path_c = tr_c.save(step=9)
    tr_d2 = Trainer(cfg, output_dir=str(tmp_path / "dense2"))
    tr_d2.load_params(path_c)
    live = pl.convert_conv_params(
        jax.tree.map(np.asarray, tr_d2.state.params), CFG_D, "compact")
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(live),
            jax.tree_util.tree_leaves_with_path(tr_c.state.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                      err_msg=str(pa))


def test_cross_layout_resume_full_state(tmp_path):
    """resume() converts params AND Adam moment/count trees across layouts:
    a dense-trained run continues under a compact config with identical
    training trajectory (and vice versa)."""
    from hm_vae_tpu.data.dataset import make_loaders
    from hm_vae_tpu.train.trainer import Trainer
    from hm_vae_tpu.utils.config import DataConfig, RunConfig

    data = DataConfig(synthetic=True, synthetic_num_seqs=4,
                      data_root=str(tmp_path / "data"),
                      use_native_loader=False)
    cfg = Config(model=CFG_D, optim=OptimConfig(batch_size=2, lr=1e-3),
                 loss=LossConfig(iteration_interval=4), data=data,
                 run=RunConfig(log_iter=100, validation_iter=10**9,
                               snapshot_save_iter=10**9,
                               image_save_iter=10**9, seed=3))
    cfg_c = dataclasses.replace(cfg, model=CFG_C)

    def fit_steps(trainer, n, resume_from=None):
        train_ds, _, _ = make_loaders(trainer.cfg)
        if resume_from is not None:
            assert trainer.resume(resume_from) == 6
        trainer.fit(train_ds, max_iter=n)
        return trainer

    # 6 steps dense, checkpoint, then 6 more under (a) dense, (b) compact
    tr_a = fit_steps(Trainer(cfg, output_dir=str(tmp_path / "a")), 6)
    ck = tr_a.save()
    tr_a = fit_steps(tr_a, 12, resume_from=None)  # continue in-process
    tr_b = fit_steps(Trainer(cfg_c, output_dir=str(tmp_path / "b")), 12,
                     resume_from=ck)
    assert int(tr_b.state.step) == 12
    want = pl.convert_conv_params(
        jax.tree.map(np.asarray, tr_a.state.params), CFG_D, "compact")
    for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_leaves_with_path(want),
            jax.tree_util.tree_leaves_with_path(tr_b.state.params)):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=2e-6, rtol=2e-5, err_msg=str(pa))


def test_run_gather_order_matches_dense_all_sparse_levels():
    """ADVICE r4: the run-granularity gather's load-bearing invariant —
    weight_c row-major order == run-major order, so
    ``w_c.reshape(n_runs, run_w, k)`` maps rows to runs — pinned over EVERY
    sparse level of the flagship model (run_w 6..48), not just level 0:
    expander(w_c) must equal the numpy densify and the custom-vjp gradient
    must equal the dense gradient at the live entries."""
    st = get_structure(FLAG_D)
    rng = np.random.RandomState(7)
    checked = 0
    for lvl in list(st.encoder_levels) + list(st.decoder_levels):
        spec = lvl.conv
        if spec.mask.all():
            continue
        meta = pl.compact_meta(spec)
        assert meta.run_w > 1          # every flagship sparse level is blocky
        wc = rng.randn(meta.n_live, spec.kernel_size).astype(np.float32)
        ex = pl.expander(spec)
        np.testing.assert_array_equal(
            np.asarray(ex(jnp.asarray(wc))),
            pl.dense_from_compact(wc, spec))
        g = rng.randn(spec.out_channels, spec.in_channels,
                      spec.kernel_size).astype(np.float32)
        (gc,) = jax.vjp(ex, jnp.asarray(wc))[1](jnp.asarray(g))
        np.testing.assert_array_equal(np.asarray(gc),
                                      g[spec.mask.astype(bool)])
        checked += 1
    assert checked == 6


def test_run_gather_irregular_mask_run_w_1():
    """An irregular (non-block-constant) mask must fall back to run_w=1 and
    stay exact — the expander's correctness cannot depend on the
    SkeletonConv mask's block structure."""
    from hm_vae_tpu.models.structure import ConvSpec

    rng = np.random.RandomState(3)
    c_out, c_in, k = 10, 9, 3
    mask = (rng.rand(c_out, c_in) > 0.4)
    mask[0] = True          # keep at least one fully-live row
    mask[1] = False
    mask[1, 4] = True       # and a nearly-dead one
    spec = ConvSpec(in_channels=c_in, out_channels=c_out, kernel_size=k,
                    stride=1, padding=1, padding_mode="reflect", bias=True,
                    mask=mask.astype(np.float32),
                    block_bounds=np.ones(5, np.float32), n_edges=5)
    meta = pl.compact_meta(spec)
    assert meta.run_w == 1 and meta.n_runs == meta.n_live
    wc = rng.randn(meta.n_live, k).astype(np.float32)
    ex = pl.expander(spec)
    np.testing.assert_array_equal(np.asarray(ex(jnp.asarray(wc))),
                                  pl.dense_from_compact(wc, spec))
    g = rng.randn(c_out, c_in, k).astype(np.float32)
    (gc,) = jax.vjp(ex, jnp.asarray(wc))[1](jnp.asarray(g))
    np.testing.assert_array_equal(np.asarray(gc), g[mask])
