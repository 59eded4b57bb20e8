"""Temporal sequence parallelism for the trajectory model.

The reference's trajectory model is fully convolutional over time and runs
arbitrary-length sequences in ONE shot on one GPU
(``trajectory_pred_model.py:399-440``) — its only length limit is device
memory.  This module removes that limit the TPU-native way: the time axis is
sharded over a mesh axis and each stride-1 conv level exchanges a
``(kernel_size-1)//2``-frame halo with its temporal neighbours over ICI via
``lax.ppermute`` inside ``shard_map``.  Convs then run VALID on the
halo-extended local shard, which is numerically identical to the unsharded
per-level padding semantics:

- interior shard boundaries see the true neighbouring *activations* (what a
  global conv would see),
- the first/last shards reflect- or zero-pad their outer edge locally, which
  equals the global-sequence padding because the halo depth never exceeds the
  shard length (enforced statically).

One exchange per level (not one big up-front halo) is required for parity:
the unsharded model pads each level's *activations*, so level ``i+1``'s
boundary context is level ``i``'s padded output, not a pre-padded input run
through the stack.

The root-trajectory integration (``gen_motion_w_trajectory``,
``trajectory_pred_model.py:289-303``) becomes a distributed prefix sum:
local ``cumsum`` plus an exclusive prefix of per-shard totals gathered over
the mesh axis (n_shards values — the collective is trivially small).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..data import layout
from ..models.structure import get_trajectory_structure
from ..models.trajectory import TrajectoryModel
from ..ops import skeleton_nn as snn


def halo_exchange(
    x: jnp.ndarray, h: int, axis_name: str, n_shards: int,
    mode: str = "reflect",
) -> jnp.ndarray:
    """Extend a time-sharded (B, C, T_local) activation by ``h`` frames per
    side: interior boundaries fetch true frames from the temporal neighbour
    shard (``ppermute`` over ICI); the global first/last shard pads its outer
    edge locally with the requested mode ('reflect' or 'constant' zeros,
    matching ``pad_temporal``).

    Must run inside ``shard_map`` over ``axis_name``.  Requires
    ``h <= T_local - 1`` so one neighbour hop (and a local reflect) suffices.
    """
    if h == 0:
        return x
    t_local = x.shape[-1]
    if h > t_local - 1:
        raise ValueError(
            f"halo {h} needs T_local >= {h + 1}, got {t_local}: use fewer "
            f"shards or longer sequences")
    mode = {"reflection": "reflect", "zeros": "constant"}.get(mode, mode)
    # my tail -> right neighbour's left halo; my head -> left neighbour's
    # right halo.  Devices with no source (the global edges) receive zeros.
    from_left = lax.ppermute(
        x[..., t_local - h:], axis_name, [(i, i + 1) for i in range(n_shards - 1)])
    from_right = lax.ppermute(
        x[..., :h], axis_name, [(i + 1, i) for i in range(n_shards - 1)])
    if mode == "reflect":
        pad_width = [(0, 0)] * (x.ndim - 1) + [(h, h)]
        padded = jnp.pad(x, pad_width, mode="reflect")
        edge_left, edge_right = padded[..., :h], padded[..., -h:]
        idx = lax.axis_index(axis_name)
        from_left = jnp.where(idx == 0, edge_left, from_left)
        from_right = jnp.where(idx == n_shards - 1, edge_right, from_right)
    # 'constant' (zeros): the ppermute fill is already the correct padding
    return jnp.concatenate([from_left, x, from_right], axis=-1)


def _encoder_local(x: jnp.ndarray, params, st, compute_dtype: str,
                   axis_name: str, n_shards: int) -> jnp.ndarray:
    """TrajectoryEncoder forward on one time shard (B, C0, T_local), halo
    exchange in place of per-level padding.  Mirrors
    ``models/trajectory.py:TrajectoryEncoder`` op for op (masked conv ->
    pool matmul -> leaky relu, optional bf16 compute)."""
    enc = params["params"]["encoder"]
    for i, lvl in enumerate(st.levels):
        s = lvl.conv
        if s.stride != 1:
            # halo + VALID equals the global conv only when shard boundaries
            # stay aligned frame-for-frame; the trajectory encoder is
            # stride-1 by construction (trajectory_pred_model.py:87)
            raise ValueError(
                f"sequence parallelism requires stride 1, level {i} has "
                f"stride {s.stride}")
        w = enc[f"conv_{i}"]["weight"]
        b = enc[f"conv_{i}"]["bias"] if s.bias else None
        cd = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
        if x.dtype != cd or w.dtype != cd:
            # bf16 compute casts down; f32 compute casts a bf16-STORED
            # weight (param_dtype) up — mirrors SkeletonConv.__call__
            x = x.astype(cd)
            w = w.astype(cd)
            b = b.astype(cd) if b is not None else None
        wm = w * jnp.asarray(s.mask, w.dtype)[:, :, None]
        x = halo_exchange(x, s.padding, axis_name, n_shards, s.padding_mode)
        x = snn.skeleton_conv_w(x, wm, b, s.stride, 0)
        x = snn.apply_channel_matrix(x, jnp.asarray(lvl.pool_matrix, x.dtype))
        x = snn.leaky_relu(x, 0.2)
    return x.astype(jnp.float32)


def sp_accumulate_root_trajectory(
    root_v: jnp.ndarray, axis_name: str
) -> jnp.ndarray:
    """Distributed ``accumulate_root_trajectory``: (B, T_local, 3) shards of
    per-step velocity -> absolute root translation, global timestep 0
    contributing nothing (``trajectory_pred_model.py:299-301``).

    Local cumsum + exclusive prefix of the all-gathered per-shard totals.
    Must run inside ``shard_map`` over ``axis_name``.
    """
    idx = lax.axis_index(axis_name)
    # zero the very first GLOBAL frame only
    first = jnp.where(idx == 0, jnp.zeros_like(root_v[:, :1]), root_v[:, :1])
    v = jnp.concatenate([first, root_v[:, 1:]], axis=1)
    local = jnp.cumsum(v, axis=1)
    totals = lax.all_gather(local[:, -1], axis_name)        # (n, B, 3)
    prefix = jnp.cumsum(totals, axis=0) - totals            # exclusive
    return local + prefix[idx][:, None, :]


def make_sp_trajectory_fn(
    model: TrajectoryModel, params, mean_std: np.ndarray, mesh: Mesh,
    axis: str = "data", pad_incomplete: bool = False,
):
    """Sequence-parallel :class:`~hm_vae_tpu.models.trajectory.TrajectoryRunner`
    core: a jitted fn ``pose (B, T, 24, 3) -> (world_pose (B, T, 24, 3),
    root_v (B, T, 3))`` with the time axis sharded over ``mesh[axis]``.

    Semantics match ``sampled_seq_test`` + ``gen_motion_w_trajectory``
    (``trajectory_pred_model.py:289-303, 399-440``): normalise with the
    dataset stats' joint-pos slice, encode, regress + de-standardise root
    velocity, integrate, add to the poses.  ``T % n_shards == 0`` and
    ``T / n_shards > (kernel_size-1)//2`` are required (documented halo
    constraint).

    ``pad_incomplete=True`` lifts the divisibility requirement for arbitrary
    eval lengths: the tail is padded by repeating the last frame up to the
    next shard multiple and outputs are trimmed back to ``T``.  Exactness:
    the trimmed root integration is exact (cumsum is causal), and the
    regressed velocities match the unsharded run everywhere except the final
    ``num_levels*(kernel_size-1)//2`` frames, whose conv context sees
    repeated frames instead of the global edge padding.
    """
    st = get_trajectory_structure(model.cfg)
    n = mesh.shape[axis]
    mean = np.asarray(mean_std[0])
    std = np.asarray(mean_std[1])
    c_mean = jnp.asarray(mean[layout.COORD].reshape(24, 3))
    c_std = jnp.asarray(np.where(std[layout.COORD] == 0, 1,
                                 std[layout.COORD]).reshape(24, 3))
    rv_mean = jnp.asarray(mean[layout.ROOT_V])
    rv_std = jnp.asarray(std[layout.ROOT_V])

    def local_fn(prms, pose):
        # pose: (B, T_local, 24, 3) unnormalised FK positions
        B, Tl, J, C = pose.shape
        x = ((pose - c_mean) / c_std).reshape(B, Tl, J * C).transpose(0, 2, 1)
        latent = _encoder_local(x, prms, st, model.cfg.compute_dtype,
                                axis, n)
        feat = latent.transpose(0, 2, 1)                    # (B, Tl, k*d)
        root_v_n = feat @ prms["params"]["fc_mapping"]["kernel"] \
            + prms["params"]["fc_mapping"]["bias"]
        root_v = rv_mean + rv_std * root_v_n
        world = pose + sp_accumulate_root_trajectory(
            root_v, axis)[:, :, None, :]
        return world, root_v

    mapped = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(None, axis, None, None)),
        out_specs=(P(None, axis, None, None), P(None, axis, None)),
        check_vma=True,
    )

    def fn(pose: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = pose.shape[1]
        pad = (-T) % n
        if pad and not pad_incomplete:
            raise ValueError(f"T={T} not divisible by {n} shards")
        if pad:
            pose = jnp.concatenate(
                [pose, jnp.repeat(pose[:, -1:], pad, axis=1)], axis=1)
        halo = (model.cfg.kernel_size - 1) // 2
        if (T + pad) // n <= halo:
            raise ValueError(
                f"shard length {(T + pad) // n} <= halo {halo}: "
                f"use fewer shards")
        world, root_v = mapped(params, pose)
        return world[:, :T], root_v[:, :T]

    return jax.jit(fn)
