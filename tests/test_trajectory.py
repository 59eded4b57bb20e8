"""Trajectory model tests: shapes, accumulation parity, training smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from hm_vae_tpu.data import layout
from hm_vae_tpu.models.structure import get_trajectory_structure
from hm_vae_tpu.models.trajectory import (
    TrajectoryModel, TrajectoryRunner, accumulate_root_trajectory,
    add_trajectory, trajectory_losses,
)
from hm_vae_tpu.utils.config import Config, LossConfig, ModelConfig, OptimConfig

TRAJ_CFG = Config(
    model=ModelConfig(model_name="TrajectoryModel", latent_d=12, kernel_size=7,
                      train_seq_len=32, trajectory_input_joint_pos=True),
    loss=LossConfig(rec_root_v_w=1.0, rec_root_trans_w=1.0),
    optim=OptimConfig(lr=1e-3),
)


def test_structure():
    st = get_trajectory_structure(TRAJ_CFG.model)
    assert st.channel_base == [3, 6, 12, 24, 48]
    assert st.d_model == 48
    assert st.out_edges == 7
    assert all(l.conv.stride == 1 for l in st.levels)


def test_forward_shapes_arbitrary_T():
    model = TrajectoryModel(TRAJ_CFG.model)
    x = jnp.zeros((2, 32, 24, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32, 3)
    # fully convolutional: different T without re-init
    out2 = model.apply(params, jnp.zeros((1, 100, 24, 3)))
    assert out2.shape == (1, 100, 3)


def test_accumulation_matches_loop():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(2, 10, 3)).astype(np.float32)
    acc = np.asarray(accumulate_root_trajectory(jnp.asarray(v)))
    # reference loop (trajectory_pred_model.py:298-301)
    ref = np.zeros_like(v)
    trans = np.zeros((2, 3), np.float32)
    for t in range(1, 10):
        trans = trans + v[:, t]
        ref[:, t] = trans
    np.testing.assert_allclose(acc, ref, atol=1e-6)

    pose = rng.normal(size=(2, 10, 24, 3)).astype(np.float32)
    world = np.asarray(add_trajectory(jnp.asarray(pose), jnp.asarray(v)))
    np.testing.assert_allclose(world, pose + ref[:, :, None, :], atol=1e-6)


def _traj_batch(key, B, T):
    from tests.test_train_step import synth_batch
    from hm_vae_tpu.ops import fk as fk_mod
    b = synth_batch(key, B, T)
    pose = fk_mod.fk_from_rotmat(b["rot_mat"], fk_mod.default_offsets())
    k2 = jax.random.split(key)[0]
    b["rot_pos"] = pose
    b["joint_pos"] = pose  # stand-in for normalised positions
    b["root_v"] = jax.random.normal(k2, (B, T, 3)) * 0.1
    return b


def test_training_reduces_loss():
    cfg = TRAJ_CFG
    model = TrajectoryModel(cfg.model)
    batch = _traj_batch(jax.random.PRNGKey(0), 4, 32)
    params = model.init(jax.random.PRNGKey(1), batch["joint_pos"])
    ms = np.stack([np.zeros(579), np.ones(579)]).astype(np.float32)

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (l, m), g = jax.value_and_grad(
            lambda p: trajectory_losses(model, p, batch, cfg, ms), has_aux=True
        )(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, l

    first = None
    for i in range(25):
        params, opt, l = step(params, opt)
        if first is None:
            first = float(l)
    assert float(l) < first, (first, float(l))


def test_runner_end_to_end():
    cfg = TRAJ_CFG
    model = TrajectoryModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 3)))
    ms = np.stack([np.zeros(579), np.ones(579)]).astype(np.float32)
    runner = TrajectoryRunner(model, params, ms)
    from tests.test_train_step import synth_batch
    b = synth_batch(jax.random.PRNGKey(1), 2, 16)
    world, root_v = runner(b["rot_6d"])
    assert world.shape == (2, 16, 24, 3)
    assert root_v.shape == (2, 16, 3)
    assert np.isfinite(np.asarray(world)).all()


def test_trajectory_ade_fde():
    from hm_vae_tpu.apps.metrics import trajectory_ade, trajectory_fde
    rng = np.random.default_rng(0)
    gt = np.cumsum(rng.normal(size=(2, 10, 3)), axis=1).astype(np.float32)
    assert float(trajectory_ade(jnp.asarray(gt), jnp.asarray(gt))) == 0.0
    off = gt + np.array([1.0, 0, 0], np.float32)
    np.testing.assert_allclose(float(trajectory_ade(jnp.asarray(off), jnp.asarray(gt))), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(trajectory_fde(jnp.asarray(off), jnp.asarray(gt))), 1.0, atol=1e-6)
