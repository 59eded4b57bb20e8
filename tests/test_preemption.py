"""Preemption-safe checkpointing: SIGTERM mid-fit -> synchronous snapshot at
the current step + clean return; --resume-style restart continues from it.

TPU-VM / GCE preemption delivers SIGTERM with a short grace window — the
reference would lose everything since the last periodic snapshot
(``train_motion_vae.py:72-74`` resume is its only recovery).  The signal is
sent to our own pid from inside the fit loop's log callback (in-process,
never pattern-matched)."""

import dataclasses
import os
import signal

import numpy as np
import jax

from hm_vae_tpu.train.trainer import build_trainer
from tests.test_trainer import tiny_cfg


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=50)
    # snapshot cadence far past max_iter: any checkpoint present afterwards
    # came from the preemption path, not the periodic one
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_iter=2,
                                     snapshot_save_iter=10_000))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    handler_before = signal.getsignal(signal.SIGTERM)

    fired = []

    def cb(step, _m):
        if step >= 4 and not fired:
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)  # our own pid, in-process

    metrics = trainer.fit(train_ds, None, log_cb=cb)
    # fit returned (did not die), well before max_iter
    assert np.isfinite(metrics["loss_total"])
    stopped_at = int(trainer.state.step)
    assert fired and fired[0] <= stopped_at < 50

    ck = trainer.latest_checkpoint()
    assert ck is not None and ck.endswith(f"gen_{stopped_at:08d}")

    # the loop's own handler was removed again
    after = signal.getsignal(signal.SIGTERM)
    assert after == handler_before or (
        handler_before is None and after == signal.SIG_DFL)

    # a fresh trainer resumes from the preemption snapshot and finishes
    trainer2, train_ds2, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    assert trainer2.resume() == stopped_at
    p_saved = jax.tree.leaves(trainer.state.params)
    p_resumed = jax.tree.leaves(trainer2.state.params)
    for a, b in zip(p_saved, p_resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer2.fit(train_ds2, None, max_iter=stopped_at + 2)
    assert int(trainer2.state.step) == stopped_at + 2


def test_sigterm_with_async_checkpointing(tmp_path):
    """The preemption snapshot is durable even with async checkpointing on:
    the SIGTERM path saves then wait_for_saves() before returning, so the
    write lands before the process is allowed to die."""
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=50)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_iter=2,
                                     snapshot_save_iter=10_000,
                                     async_checkpoint=True))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))

    fired = []

    def cb(step, _m):
        if step >= 4 and not fired:
            fired.append(step)
            os.kill(os.getpid(), signal.SIGTERM)

    trainer.fit(train_ds, None, log_cb=cb)
    stopped_at = int(trainer.state.step)
    assert fired and stopped_at < 50

    trainer2, _, _, _ = build_trainer(cfg, os.path.join(tmp, "run"))
    assert trainer2.resume() == stopped_at
    p_saved = jax.tree.leaves(trainer.state.params)
    p_resumed = jax.tree.leaves(trainer2.state.params)
    for a, b in zip(p_saved, p_resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_preemption_handler_disabled_by_config(tmp_path):
    """preemption_checkpoint=False leaves SIGTERM handling untouched."""
    tmp = str(tmp_path)
    cfg = tiny_cfg(tmp, max_iter=2)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, preemption_checkpoint=False))
    trainer, train_ds, _, _ = build_trainer(cfg, os.path.join(tmp, "runoff"))

    seen = []

    def mine(*a):
        seen.append(a)

    prev = signal.signal(signal.SIGTERM, mine)
    try:
        def cb(step, _m):
            # fit must NOT have replaced the user's handler
            assert signal.getsignal(signal.SIGTERM) is mine
            os.kill(os.getpid(), signal.SIGTERM)

        trainer.fit(train_ds, None, log_cb=cb)
        assert seen  # the user's handler fired, fit ran to completion
        assert int(trainer.state.step) == 2
    finally:
        signal.signal(signal.SIGTERM, prev if prev is not None
                      else signal.SIG_DFL)
