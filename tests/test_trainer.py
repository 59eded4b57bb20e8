"""Trainer integration tests: fit loop, checkpoint save/resume round-trip."""

import glob
import os

import pytest
import numpy as np
import jax

from hm_vae_tpu.train.trainer import Trainer, build_trainer
from hm_vae_tpu.utils.config import (
    Config, DataConfig, LossConfig, ModelConfig, OptimConfig, RunConfig,
)


def tiny_cfg(tmp, max_iter=6, model_name="TwoHierSAVAEModel"):
    return Config(
        model=ModelConfig(model_name=model_name, latent_d=6, shallow_latent_d=6,
                          kernel_size=3, train_seq_len=8),
        loss=LossConfig(iteration_interval=3, rec_root_v_w=1.0,
                        rec_root_trans_w=1.0),
        optim=OptimConfig(lr=1e-3, batch_size=4, max_iter=max_iter),
        data=DataConfig(data_root=os.path.join(tmp, "data"), synthetic=True,
                        synthetic_num_seqs=6),
        run=RunConfig(log_iter=2, validation_iter=4, snapshot_save_iter=5),
    )


def test_fit_and_checkpoint_roundtrip(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp)
    trainer, train_ds, val_ds, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    logged = []
    metrics = trainer.fit(train_ds, val_ds, log_cb=lambda s, m: logged.append(s))
    assert np.isfinite(metrics["loss_total"])
    assert int(trainer.state.step) == 6
    assert logged  # log cadence hit

    # snapshot written at step 5
    ck = trainer.latest_checkpoint()
    assert ck and ck.endswith("gen_00000005")

    # fresh trainer resumes exactly
    trainer2, train_ds2, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    step = trainer2.resume()
    assert step == 5
    p1 = jax.tree.leaves(trainer.state.params)
    # continue training from restored state
    trainer2.fit(train_ds2, None, max_iter=7)
    assert int(trainer2.state.step) == 7

    # metrics jsonl exists
    assert os.path.exists(os.path.join(tmp, "run", "logs", "metrics.jsonl"))


def test_trajectory_trainer_fit(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=4, model_name="TrajectoryModel")
    # trajectory needs a bigger kernel config normally; tiny is fine here
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runT"))
    m = trainer.fit(train_ds, None)
    assert np.isfinite(m["loss_total"])
    assert "loss_rec_root_v" in m


def test_trajectory_trainer_without_mean_std_hard_errors(tmp_path):
    """Training a TrajectoryModel without dataset stats must fail loud
    (r3 verdict): zeros/ones normalisation silently breaks the
    de-standardisation semantics of the root-velocity loss."""
    import pytest

    from hm_vae_tpu.train.trainer import Trainer

    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=2, model_name="TrajectoryModel")
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runM"))
    trainer.mean_std = None  # simulate a direct Trainer(cfg) construction
    with pytest.raises(ValueError, match="mean/std"):
        trainer.fit(train_ds, None)


def test_resume_with_explicit_missing_dir(tmp_path):
    cfg = tiny_cfg(str(tmp_path), max_iter=1)
    trainer, *_ = build_trainer(cfg, os.path.join(str(tmp_path), "run2"))
    assert trainer.resume() == 0  # no checkpoint yet -> step 0


def test_fit_with_steps_per_call(tmp_path):
    import dataclasses
    from hm_vae_tpu.utils.config import RunConfig
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=8)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, steps_per_call=4))
    trainer, train_ds, val_ds, _ = build_trainer(cfg, os.path.join(tmp, "runK"))
    m = trainer.fit(train_ds, val_ds)
    assert int(trainer.state.step) == 8
    assert np.isfinite(m["loss_total"])


def test_image_save_visualization(tmp_path):
    import dataclasses
    import glob
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=3)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, image_save_iter=2))
    trainer, train_ds, _, test_ds = build_trainer(cfg, os.path.join(tmp, "runV"))
    trainer.fit(train_ds, None, test_ds=test_ds)
    vids = glob.glob(os.path.join(tmp, "runV", "images", "*", "*"))
    assert len(vids) >= 2, vids


def test_fit_steps_per_call_nondivisible_tail(tmp_path):
    """max_iter not divisible by steps_per_call must finish exactly."""
    import dataclasses
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=10)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, steps_per_call=4))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runTail"))
    m = trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 10
    assert np.isfinite(m["loss_total"])


def test_keep_checkpoints_retention(tmp_path):
    import dataclasses
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=9)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, snapshot_save_iter=3, keep_checkpoints=2))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runKeep"))
    trainer.fit(train_ds, None)
    ckpts = sorted(os.listdir(os.path.join(tmp, "runKeep", "checkpoints")))
    assert len(ckpts) == 2, ckpts
    assert ckpts[-1] == "gen_00000009"


def test_nan_guard_restores_from_checkpoint(tmp_path):
    import dataclasses
    import jax
    import jax.numpy as jnp
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=4)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, snapshot_save_iter=2, log_iter=1, steps_per_call=1))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runNan"))
    trainer.fit(train_ds, None, max_iter=3)  # snapshot at step 2
    assert trainer.latest_checkpoint().endswith("gen_00000002")

    # poison the params: the next logged loss is non-finite
    trainer.state = trainer.state.replace(
        params=jax.tree.map(lambda x: x * jnp.nan, trainer.state.params))
    trainer.fit(train_ds, None, max_iter=4)
    # guard must have restored step-2 params and finished at step 4 with
    # finite loss
    assert int(trainer.state.step) == 4
    leaf = np.asarray(jax.tree.leaves(trainer.state.params)[0])
    assert np.isfinite(leaf).all()


def test_nan_guard_raises_when_checkpoint_itself_is_corrupt(tmp_path):
    """If the LATEST checkpoint already contains the NaNs, restoring it
    can't help — the guard must fail loud instead of restore-looping."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import pytest
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=6)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, snapshot_save_iter=2, log_iter=1, steps_per_call=1))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runNan2"))
    trainer.fit(train_ds, None, max_iter=3)
    # poison params AND save them: the newest checkpoint is now corrupt
    trainer.state = trainer.state.replace(
        params=jax.tree.map(lambda x: x * jnp.nan, trainer.state.params))
    trainer.save(3)
    trainer.wait_for_saves()
    with pytest.raises(FloatingPointError, match="recurred"):
        trainer.fit(train_ds, None, max_iter=6)


@pytest.mark.slow
def test_float16_transfer_mode(tmp_path):
    """transfer_dtype=float16 trains with near-identical losses to f32."""
    import dataclasses
    tmp = str(tmp_path)
    cfg32 = tiny_cfg(tmp, max_iter=8)
    cfg32 = dataclasses.replace(cfg32, run=dataclasses.replace(
        cfg32.run, steps_per_call=4))
    cfg16 = dataclasses.replace(cfg32, data=dataclasses.replace(
        cfg32.data, transfer_dtype="float16"))

    t32, ds32, _, _ = build_trainer(cfg32, os.path.join(tmp, "r32"))
    m32 = t32.fit(ds32, None)
    t16, ds16, _, _ = build_trainer(cfg16, os.path.join(tmp, "r16"))
    m16 = t16.fit(ds16, None)
    assert np.isfinite(m16["loss_total"])
    # same data/seed, only the wire precision differs
    assert abs(m16["loss_total"] - m32["loss_total"]) < 0.05 * m32["loss_total"] + 0.01


def test_fit_with_rot6d_wire(tmp_path):
    """End-to-end fit over the compact rot6d wire (native loader, K-step
    dispatch): 33% smaller host->device transfer, device-side Gram-Schmidt
    rotmat reconstruction.  Loss finite and steps advance."""
    import dataclasses
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=8)
    cfg = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, steps_per_call=4),
        data=dataclasses.replace(cfg.data, compact_transfer=True,
                                 wire_format="rot6d",
                                 transfer_dtype="float16"))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runW"))
    m = trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 8
    assert np.isfinite(m["loss_total"])


def test_async_checkpoint_roundtrip(tmp_path):
    """async_checkpoint=True: saves overlap training (device-side snapshot +
    background writer), survive the donated-state hazard, and restore to the
    exact same state as the synchronous path."""
    import dataclasses
    import jax

    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=8)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, steps_per_call=2, snapshot_save_iter=4,
        async_checkpoint=True))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runA"))
    trainer.fit(train_ds, None)  # saves at 4 and 8 while stepping
    assert int(trainer.state.step) == 8

    # an explicit async save of the final state must round-trip exactly
    trainer.save(8)
    trainer.wait_for_saves()
    t2, _, _, _ = build_trainer(cfg, os.path.join(tmp, "runA"))
    assert t2.resume() == 8
    for a, b in zip(jax.tree.leaves(trainer.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # an interrupted orbax atomic write leaves a gen_*.orbax-checkpoint-tmp-*
    # staging dir: it must never be resumed from or counted toward retention
    os.makedirs(os.path.join(trainer.ckpt_dir,
                             "gen_00000009.orbax-checkpoint-tmp-123"))
    assert trainer.latest_checkpoint().endswith("gen_00000008")
    assert "tmp" not in " ".join(trainer._checkpoint_names())


def test_async_save_error_surfaces_at_join(tmp_path, monkeypatch):
    """A failed background checkpoint write must raise at the next
    wait_for_saves() instead of being silently swallowed (the run would
    otherwise believe the checkpoint exists until a NaN-guard restore finds
    nothing)."""
    import dataclasses

    import pytest

    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=2)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, async_checkpoint=True))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runE"))
    trainer.fit(train_ds, None)

    def boom(path, state):
        raise OSError("disk full")

    monkeypatch.setattr(trainer, "_write_checkpoint", boom)
    trainer.save(2)
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        trainer.wait_for_saves()
    # the error is consumed: subsequent waits are clean
    trainer.wait_for_saves()


@pytest.mark.slow
def test_cadence_not_refired_by_superbatch_tail(tmp_path):
    """max_iter=10, K=4, snapshot_save_iter=8: the save fires when the K-step
    dispatch crosses 8, and the 2-step tail (8->10) must NOT re-fire it (the
    old `crossed` used a constant K-wide window in the tail branch)."""
    import dataclasses
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=10)
    cfg = dataclasses.replace(cfg, run=dataclasses.replace(
        cfg.run, steps_per_call=4, snapshot_save_iter=8, log_iter=100))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runT"))
    trainer.fit(train_ds, None)
    assert int(trainer.state.step) == 10
    assert trainer._checkpoint_names() == ["gen_00000008"]


@pytest.mark.slow
def test_fit_with_aa_wire_f16_loss_impact(tmp_path):
    """The f16 axis-angle wire (half the rot6d bytes) trains end to end, and
    its f16 quantisation (~1e-3 rad of target noise) moves the loss by no
    more than the f16-rot6d wire's own tolerance band."""
    import dataclasses
    tmp = str(tmp_path)
    base = tiny_cfg(tmp, max_iter=8)
    base = dataclasses.replace(
        base, run=dataclasses.replace(base.run, steps_per_call=4))

    def run(wire, dtype, sub):
        cfg = dataclasses.replace(base, data=dataclasses.replace(
            base.data, compact_transfer=True, wire_format=wire,
            transfer_dtype=dtype))
        trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, sub))
        m = trainer.fit(train_ds, None)
        assert int(trainer.state.step) == 8
        return m["loss_total"]

    l_ref = run("rot6d", "float32", "runR32")
    l_aa = run("aa", "float16", "runA16")
    assert np.isfinite(l_aa)
    # same data/seed; only the wire representation + precision differ
    assert abs(l_aa - l_ref) < 0.05 * l_ref + 0.01


def test_matmul_precision_knob(tmp_path):
    """run.matmul_precision="highest" must take effect process-wide when the
    Trainer is built (the memorization-regime convergence-depth knob — see
    PARITY.md 10k-step device compare) and the run must still train."""
    import dataclasses

    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=2)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, matmul_precision="highest"))
    prev = jax.config.jax_default_matmul_precision
    try:
        trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
        assert str(jax.config.jax_default_matmul_precision) == "highest"
        metrics = trainer.fit(train_ds, None)
        assert np.isfinite(metrics["loss_total"])
    finally:
        jax.config.update("jax_default_matmul_precision", prev)


def test_load_params_across_optimizer_formats(tmp_path):
    """load_params must stay params-only: a checkpoint written under a
    DIFFERENT optimizer-state layout (none_grad_skip off, the pre-round-3
    chain) must load for eval into a trainer running the current default —
    the eval CLIs feed --test_model through this path and the reference's
    load_ckpt likewise only restores the generator weights."""
    import dataclasses

    tmp = str(tmp_path)
    cfg_old = tiny_cfg(tmp, max_iter=2)
    cfg_old = dataclasses.replace(
        cfg_old, optim=dataclasses.replace(cfg_old.optim,
                                           none_grad_skip=False))
    trainer, train_ds, _, _ = build_trainer(cfg_old, os.path.join(tmp, "runA"))
    trainer.fit(train_ds, None)
    trainer.save()
    trainer.wait_for_saves()
    ck = trainer.latest_checkpoint()
    assert ck

    cfg_new = tiny_cfg(tmp, max_iter=2)
    assert cfg_new.optim.none_grad_skip
    trainer2, _, _, _ = build_trainer(cfg_new, os.path.join(tmp, "runB"))
    trainer2.load_params(ck)
    # reference load_ckpt semantics: weights only — iteration counter and
    # optimizer state stay fresh (trainer_motion_vae.py:129-135)
    assert int(trainer2.state.step) == 0
    a = jax.tree.leaves(trainer.state.params)
    b = jax.tree.leaves(trainer2.state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_fit_survives_empty_validation_split(tmp_path):
    """A val dataset yielding zero batches must not crash the val cadence."""
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=4)
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runEV"))

    class EmptyVal:
        def ordered_batches(self, *a, **k):
            return iter(())

    m = trainer.fit(train_ds, EmptyVal(), max_iter=4)
    assert np.isfinite(m["loss_total"])
