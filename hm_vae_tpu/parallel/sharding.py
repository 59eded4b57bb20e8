"""SPMD training: device mesh, sharding rules, sharded train step.

The reference's only parallelism is single-process ``torch.nn.DataParallel``
(``train_motion_vae.py:49-53``) with per-replica backward inside forward.  The
TPU-native replacement is GSPMD: one pure train step jitted over a
``jax.sharding.Mesh`` with

- the batch axis sharded over ``data`` (gradients all-reduce over ICI via the
  compiler-inserted ``psum``),
- latent Dense kernels optionally sharded over ``model`` (tensor parallelism —
  not needed for this model's size, but exposed so the same step scales),
- everything else replicated.

``make_mesh`` builds a 2-D (data, model) mesh from however many devices exist;
tests run on 8 virtual CPU devices, the driver dry-runs ``dryrun_multichip``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax

import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.hm_vae import HMVAE
from ..train.train_step import TrainState, create_state, make_train_step
from ..utils.config import Config


def make_mesh(
    n_devices: Optional[int] = None, model_parallel: int = 1
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are sharded over the leading (batch) axis."""
    return NamedSharding(mesh, P("data"))


def _param_spec(path: Tuple, leaf: jax.ShapeDtypeStruct, model_size: int) -> P:
    """Tensor-parallel rule: latent Dense kernels shard their output features
    over the ``model`` axis when divisible; conv weights stay replicated
    (their channel structure is mask-blocked and small)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    joined = "/".join(str(n) for n in names)
    if model_size > 1 and ("latent_head" in joined or "latent_dec" in joined):
        # rank guards: the optimizer's per-leaf step counters
        # (TorchAdamL2State.counts) mirror the param tree with SCALAR
        # leaves, so a "kernel"-pathed leaf is not necessarily rank>=2
        if (names[-1] == "kernel" and leaf.ndim >= 2
                and leaf.shape[-1] % model_size == 0):
            return P(None, "model")
        if (names[-1] == "bias" and leaf.ndim >= 1
                and leaf.shape[-1] % model_size == 0):
            return P("model")
    return P()


def state_sharding(state_shape, mesh: Mesh):
    """NamedShardings for a TrainState eval_shape pytree."""
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        return NamedSharding(mesh, _param_spec(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(to_sharding, state_shape)


def create_sharded_state(
    model: HMVAE, cfg: Config, rng: jax.Array, mesh: Mesh
) -> Tuple[TrainState, Dict]:
    """Initialise the train state directly with its target shardings."""
    state_shape = jax.eval_shape(lambda r: create_state(model, cfg, r), rng)
    shardings = state_sharding(state_shape, mesh)
    state = jax.jit(
        lambda r: create_state(model, cfg, r), out_shardings=shardings
    )(rng)
    return state, shardings


def make_sharded_train_step(model: HMVAE, cfg: Config, mesh: Mesh,
                            shardings) -> callable:
    """Jit the pure train step with explicit in/out shardings.

    The state buffer is donated: parameters and optimizer state update
    in place on-device (no HBM double-buffering of the model).
    """
    step = make_train_step(model, cfg)
    bsh = batch_sharding(mesh)
    metric_sh = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(shardings, bsh, metric_sh),
        out_shardings=(shardings, metric_sh),
        donate_argnums=(0,),
    )


def device_put_batch(batch: Dict[str, np.ndarray], mesh: Mesh):
    """Host -> device transfer with the batch axis pre-sharded over `data`."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
