"""Jitted training / validation steps and the train state.

The reference hides backward inside ``model.forward`` and lets DataParallel
average replica losses (``seq_two_hier_sa_vae.py:413-414``,
``trainer_motion_vae.py:37-98``).  Here a single pure ``train_step`` is
``jax.value_and_grad``-ed once and jitted; data parallelism comes for free by
sharding the batch axis over a mesh (see :mod:`hm_vae_tpu.parallel.sharding`)
— XLA inserts the gradient ``psum`` over ICI.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models.hm_vae import HMVAE
from ..utils.config import Config
from .losses import hmvae_forward
from .optim import make_optimizer


@flax.struct.dataclass
class TrainState:
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32


def cast_params(params, param_dtype: str):
    """Cast floating param leaves to the storage dtype (OptimConfig.param_dtype).

    A no-op for float32.  Init always draws in f32 (so the bf16 mode starts
    from the rounding of the SAME init as f32 training), then rounds once.
    """
    pd = jnp.dtype(param_dtype)
    if pd == jnp.float32:
        return params
    return jax.tree.map(
        lambda x: x.astype(pd) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)


def create_state(model: HMVAE, cfg: Config, rng: jax.Array) -> TrainState:
    B, T = 2, cfg.model.train_seq_len
    dummy = jnp.zeros((B, T, cfg.model.n_joints, cfg.model.input_dim))
    params = cast_params(model.init(rng, dummy), cfg.optim.param_dtype)
    tx = make_optimizer(cfg.optim)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model: HMVAE, cfg: Config
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the pure (state, batch, rng) -> (state, metrics) step."""
    tx = make_optimizer(cfg.optim)

    def loss_fn(params, batch, rng, step):
        return hmvae_forward(model, params, batch, rng, step, cfg, sample=True)

    def train_step(state: TrainState, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.step
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, metrics

    return train_step


def make_multi_step(model: HMVAE, cfg: Config, unroll: int = 1):
    """K gradient steps per dispatch via an on-device ``lax.scan``.

    The single-step pipeline is host-dispatch latency-bound at the reference's
    batch size (8x64 frames is ~1.5 ms of compute on a v5e chip); scanning K
    steps over a stacked (K, B, ...) super-batch amortises the launch to one
    dispatch per K steps.  Metrics returned are from the *last* step.
    """
    step = make_train_step(model, cfg)

    def multi_step(state: TrainState, batches, rng):
        def body(st, xs):
            b, i = xs
            new_st, metrics = step(st, b, jax.random.fold_in(rng, i))
            return new_st, metrics

        K = jax.tree.leaves(batches)[0].shape[0]
        state, metrics = jax.lax.scan(
            body, state, (batches, jnp.arange(K)), unroll=unroll)
        return state, jax.tree.map(lambda m: m[-1], metrics)

    return multi_step


def make_eval_step(model: HMVAE, cfg: Config):
    def eval_step(state: TrainState, batch, rng):
        _, metrics = hmvae_forward(
            model, state.params, batch, rng, state.step, cfg, sample=True
        )
        return metrics

    return eval_step
