"""Temporal sequence parallelism vs the unsharded trajectory path.

The SP formulation (per-level halo exchange + VALID convs + distributed
prefix-sum integration) must reproduce the single-device full-sequence
result exactly — interior shard boundaries see true neighbour activations,
global edges reproduce the per-level reflect/zero padding.  8 virtual CPU
devices (conftest).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.models.trajectory import (
    TrajectoryModel, add_trajectory, make_root_v_fn,
)
from hm_vae_tpu.parallel import sharding as sh
from hm_vae_tpu.parallel.sequence_parallel import (
    halo_exchange, make_sp_trajectory_fn, sp_accumulate_root_trajectory,
)
from hm_vae_tpu.utils.config import Config, ModelConfig

# kernel 7 -> halo 3/level; T=64 over 8 shards -> T_local=8 > 3
SP_CFG = Config(model=ModelConfig(
    model_name="TrajectoryModel", latent_d=12, kernel_size=7,
    train_seq_len=64, trajectory_input_joint_pos=True))


def _mean_std(rng):
    ms = np.stack([rng.normal(size=579) * 0.1,
                   1.0 + rng.random(579)]).astype(np.float32)
    return ms


def _setup(cfg=SP_CFG):
    model = TrajectoryModel(cfg.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 3)))
    ms = _mean_std(np.random.default_rng(0))
    return model, params, ms


def test_halo_exchange_matches_global_slices():
    """Each extended shard equals the matching slice of the globally padded
    sequence, for both padding modes."""
    mesh = sh.make_mesh(8, model_parallel=1)
    n, h, t_local = 8, 3, 8
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 5, n * t_local)),
        jnp.float32)

    for mode in ("reflect", "constant"):
        fn = jax.shard_map(
            lambda s: halo_exchange(s, h, "data", n, mode),
            mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(None, None, "data"),),
            out_specs=jax.sharding.PartitionSpec(None, None, "data"),
            check_vma=False,
        )
        ext = np.asarray(fn(x))                    # (2, 5, n*(t_local+2h))
        gx = np.pad(np.asarray(x), [(0, 0), (0, 0), (h, h)], mode=mode)
        w = t_local + 2 * h
        for i in range(n):
            np.testing.assert_allclose(
                ext[..., i * w:(i + 1) * w],
                gx[..., i * t_local:i * t_local + w],
                err_msg=f"shard {i} mode {mode}")


def test_sp_accumulate_matches_cumsum():
    mesh = sh.make_mesh(8, model_parallel=1)
    v = jnp.asarray(np.random.default_rng(2).normal(size=(3, 64, 3)),
                    jnp.float32)
    fn = jax.shard_map(
        lambda s: sp_accumulate_root_trajectory(s, "data"),
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(None, "data", None),),
        out_specs=jax.sharding.PartitionSpec(None, "data", None),
        check_vma=False,
    )
    got = np.asarray(fn(v))
    ref = np.cumsum(np.asarray(v).copy(), axis=1)
    ref -= np.asarray(v)[:, :1]  # t=0 contributes nothing
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("padding_mode", ["reflection", "zeros"])
def test_sp_trajectory_matches_unsharded(padding_mode):
    cfg = dataclasses.replace(
        SP_CFG, model=dataclasses.replace(SP_CFG.model,
                                          padding_mode=padding_mode))
    model, params, ms = _setup(cfg)
    mesh = sh.make_mesh(8, model_parallel=1)
    pose = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 64, 24, 3)), jnp.float32)

    sp = make_sp_trajectory_fn(model, params, ms, mesh)
    world_sp, rv_sp = sp(pose)

    predict = jax.jit(make_root_v_fn(model, params, ms))
    rv_ref = predict(pose)
    world_ref = add_trajectory(pose, rv_ref)

    np.testing.assert_allclose(np.asarray(rv_sp), np.asarray(rv_ref),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(world_sp), np.asarray(world_ref),
                               rtol=2e-4, atol=2e-5)


def test_sp_rejects_too_short_shards():
    model, params, ms = _setup()
    mesh = sh.make_mesh(8, model_parallel=1)
    sp = make_sp_trajectory_fn(model, params, ms, mesh)
    with pytest.raises(ValueError, match="halo"):
        sp(jnp.zeros((1, 16, 24, 3)))   # T_local=2 <= halo 3
    with pytest.raises(ValueError, match="divisible"):
        sp(jnp.zeros((1, 65, 24, 3)))


def test_sp_pad_and_trim_matches_prefix():
    """TrajectoryRunner(sp_mesh=...) on a non-divisible length: pad-and-trim
    is exact except the final num_levels*halo frames (whose conv context sees
    repeated frames instead of the global edge padding), and the trimmed
    integration stays exact because cumsum is causal."""
    from hm_vae_tpu.models.trajectory import TrajectoryRunner

    model, params, ms = _setup()
    mesh = sh.make_mesh(8, model_parallel=1)
    T = 60                                   # pads to 64 over 8 shards
    pose = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, T, 24, 3)), jnp.float32)

    runner = TrajectoryRunner(model, params, ms, sp_mesh=mesh)
    world_sp, rv_sp = runner(pose)
    assert world_sp.shape == (2, T, 24, 3) and rv_sp.shape == (2, T, 3)

    rv_ref = jax.jit(make_root_v_fn(model, params, ms))(pose)
    world_ref = add_trajectory(pose, rv_ref)
    rf = 4 * 3   # 4 conv levels (cascade 24->14->9->7), halo 3 each (kernel 7)
    np.testing.assert_allclose(
        np.asarray(rv_sp)[:, :T - rf], np.asarray(rv_ref)[:, :T - rf],
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(world_sp)[:, :T - rf], np.asarray(world_ref)[:, :T - rf],
        rtol=2e-4, atol=2e-5)
    assert np.isfinite(np.asarray(world_sp)).all()


def test_sp_long_sequence_smoke():
    """An 'arbitrary-T' run well past the train length — the capability the
    reference claims one-shot on one GPU (trajectory_pred_model.py:399-440),
    here sharded 8 ways."""
    model, params, ms = _setup()
    mesh = sh.make_mesh(8, model_parallel=1)
    pose = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 1024, 24, 3)), jnp.float32)
    sp = make_sp_trajectory_fn(model, params, ms, mesh)
    world, rv = sp(pose)
    assert world.shape == (1, 1024, 24, 3)
    assert np.isfinite(np.asarray(world)).all()


def test_runner_strict_mode_rejects_non_divisible():
    """sp_pad_incomplete=False (CLI --sequence_parallel_strict) demands
    T % n_shards == 0 so parity-sensitive evals never silently accept the
    documented pad-and-trim tail divergence (round-3 advisor item)."""
    from hm_vae_tpu.models.trajectory import TrajectoryRunner

    model, params, ms = _setup()
    mesh = sh.make_mesh(8, model_parallel=1)
    runner = TrajectoryRunner(model, params, ms, sp_mesh=mesh,
                              sp_pad_incomplete=False)
    with pytest.raises(ValueError, match="divisible"):
        runner(jnp.zeros((1, 60, 24, 3)))
    # divisible lengths still run
    world, rv = runner(jnp.asarray(
        np.random.default_rng(7).normal(size=(1, 64, 24, 3)), jnp.float32))
    assert world.shape == (1, 64, 24, 3) and rv.shape == (1, 64, 3)
