"""Optimizer / LR-schedule factories (optax).

Parity notes:
- torch ``Adam(weight_decay=wd)`` folds ``wd * p`` into the *gradient* (L2
  regularisation), unlike AdamW.  Equivalent optax chain:
  ``add_decayed_weights(wd) -> scale_by_adam -> scale_by_learning_rate``.
- ``StepLR(step_size, gamma)`` == lr * gamma^(step // step_size); ``MultiStepLR``
  uses milestone boundaries.  (``trainer_motion_vae.py:29-35, 251-262``.)
"""

from __future__ import annotations

from typing import Sequence

import optax

from ..utils.config import OptimConfig


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    return make_schedule_raw(cfg.lr, cfg.lr_policy, cfg.step_size, cfg.gamma)


def make_schedule_raw(lr: float, policy: str, step_size, gamma: float) -> optax.Schedule:
    if policy == "constant" or not policy:
        return optax.constant_schedule(lr)
    if policy == "step":
        return lambda step: lr * gamma ** (step // int(step_size))
    if policy == "mstep":
        milestones: Sequence[int] = tuple(step_size)
        boundaries = {int(m): gamma for m in milestones}
        return optax.piecewise_constant_schedule(lr, boundaries)
    raise ValueError(f"unknown lr_policy: {policy}")


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    parts = []
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(make_schedule(cfg)))
    return optax.chain(*parts)


def make_latent_optimizer(lr: float, policy: str, step_size, gamma: float,
                          weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam for test-time latent optimization (Adam(z, lr=opt_lr) with StepLR,
    seq_two_hier_sa_vae.py:1162-1163)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale_by_learning_rate(
        make_schedule_raw(lr, policy, step_size, gamma)))
    return optax.chain(*parts)
