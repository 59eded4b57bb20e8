"""Root-trajectory prediction model (flax).

Re-design of the reference ``TrajectoryModel``
(``trajectory_pred_model.py:45-260, 399-440``):

- stride-1 skeleton conv/pool encoder (channel base 3 for joint-position
  input) -> per-frame latent (B, 7*d_model, T);
- ``fc_mapping``: Linear(7*d_model -> 3) per frame regressing normalised root
  velocity;
- trajectory accumulation (``gen_motion_w_trajectory``,
  ``trajectory_pred_model.py:289-303``) as a ``cumsum`` instead of a Python
  loop over timesteps;
- fully convolutional: runs on arbitrary T in one shot.

The reference's never-instantiated trajectory Decoder
(``trajectory_pred_model.py:117-172``) is intentionally not rebuilt.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data import layout
from ..ops import fk as fk_mod
from ..ops import rotations as rot
from ..ops import skeleton_nn as snn
from ..utils.config import Config, ModelConfig
from .hm_vae import SkeletonConv, dense_kernel_init
from .structure import get_trajectory_structure


class TrajectoryEncoder(nn.Module):
    """Stride-1 cascade: (B, C0, T) -> (B, out_edges*d_model, T)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        st = get_trajectory_structure(self.cfg)
        for i, lvl in enumerate(st.levels):
            x = SkeletonConv(lvl.conv, self.cfg.compute_dtype,
                             param_layout=self.cfg.param_layout,
                             name=f"conv_{i}")(x)
            x = snn.apply_channel_matrix(x, jnp.asarray(lvl.pool_matrix, x.dtype))
            x = snn.leaky_relu(x, 0.2)
        return x.astype(jnp.float32)


class TrajectoryModel(nn.Module):
    """Per-frame root velocity regression from pose sequences."""

    cfg: ModelConfig
    # weights_init scheme for fc_mapping (a plain nn.Linear in the reference,
    # so the trainer's weights_init rebinds it; trainer_motion_vae.py:264-283)
    init_type: str = "kaiming"

    @nn.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """inputs: (B, T, 24, C0) -> root_v (B, T, 3), normalised units."""
        st = get_trajectory_structure(self.cfg)
        B, T, J, C0 = inputs.shape
        x = inputs.reshape(B, T, J * C0).transpose(0, 2, 1)
        latent = TrajectoryEncoder(self.cfg, name="encoder")(x)
        # (B, k*d, T) -> (B, T, k*d); keep (edge, channel) interleaving
        # identical to the reference's view/transpose chain
        # (trajectory_pred_model.py:230-235)
        feat = latent.transpose(0, 2, 1)
        return nn.Dense(
            3, kernel_init=dense_kernel_init(self.init_type),
            bias_init=nn.initializers.zeros, name="fc_mapping",
        )(feat)


def accumulate_root_trajectory(root_v: jnp.ndarray) -> jnp.ndarray:
    """(B, T, 3) per-step root velocity -> (B, T, 3) absolute root translation.

    Timestep 0 contributes nothing (the reference's loop starts at t=1,
    ``trajectory_pred_model.py:299-301``); implemented as a masked cumsum.
    """
    v = root_v.at[:, 0].set(0.0)
    return jnp.cumsum(v, axis=1)


def add_trajectory(pose: jnp.ndarray, root_v: jnp.ndarray) -> jnp.ndarray:
    """Place poses in world space: (B, T, 24, 3) + accumulated root_v."""
    return pose + accumulate_root_trajectory(root_v)[:, :, None, :]


def make_root_v_fn(model: TrajectoryModel, params, mean_std: np.ndarray):
    """Pure, params-closed root-velocity predictor — shared by
    :class:`TrajectoryRunner` (jitted in-process) and
    :mod:`hm_vae_tpu.apps.export` (AOT-serialized for serving).

    pose (B, T, 24, 3) unnormalised FK positions -> root_v (B, T, 3) in
    *unnormalised* units: normalise with the dataset stats' joint-pos slice,
    run the encoder, de-standardise (``trajectory_pred_model.py:399-440``).
    """
    mean = jnp.asarray(mean_std[0])
    std = jnp.asarray(mean_std[1])
    c_mean = mean[layout.COORD].reshape(24, 3)
    c_std = std[layout.COORD].reshape(24, 3)
    rv_mean = mean[layout.ROOT_V]
    rv_std = std[layout.ROOT_V]

    def predict_root_v(pose: jnp.ndarray) -> jnp.ndarray:
        normalized = (pose - c_mean) / c_std
        root_v_n = model.apply(params, normalized)
        return rv_mean + rv_std * root_v_n

    return predict_root_v


class TrajectoryRunner:
    """Inference wrapper: 6D/positions in -> world-space pose sequence out.

    Mirrors ``sampled_seq_test`` (``trajectory_pred_model.py:399-440``):
    FK -> normalise with the dataset stats' joint-pos slice -> encoder ->
    de-standardise root_v -> integrate.

    ``sp_mesh``: optional mesh for temporal sequence parallelism — the time
    axis is sharded over ``sp_mesh[sp_axis]`` with per-level halo exchange
    (:mod:`hm_vae_tpu.parallel.sequence_parallel`), removing the
    single-device memory limit the reference's one-shot arbitrary-T run has.
    Arbitrary lengths are handled by pad-and-trim (see
    ``make_sp_trajectory_fn(pad_incomplete=True)``); parity-sensitive
    evaluations can pass ``sp_pad_incomplete=False`` to demand
    ``T % n_shards == 0`` (the padded tail's conv context sees repeated
    frames, so the final ``num_levels*(kernel_size-1)//2`` velocities are
    not bit-comparable to an unsharded run).
    """

    def __init__(self, model: TrajectoryModel, params, mean_std: np.ndarray,
                 sp_mesh=None, sp_axis: str = "data",
                 sp_pad_incomplete: bool = True):
        self.model = model
        self.params = params
        self.mean = jnp.asarray(mean_std[0])
        self.std = jnp.asarray(mean_std[1])
        self._predict = make_root_v_fn(model, params, mean_std)
        self._jit_pred = jax.jit(self._predict)
        self._sp = None
        if sp_mesh is not None and sp_mesh.shape[sp_axis] > 1:
            from ..parallel.sequence_parallel import make_sp_trajectory_fn

            self._sp = make_sp_trajectory_fn(
                model, params, mean_std, sp_mesh, sp_axis,
                pad_incomplete=sp_pad_incomplete)

    def __call__(self, data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """data: (B, T, 24, 6) rot6d or (B, T, 24, 3) positions.

        Returns (world_pose (B,T,24,3), root_v (B,T,3) unnormalised).
        """
        if data.shape[-1] == 6:
            pose = fk_mod.fk_from_rot6d(data, fk_mod.default_offsets())
        else:
            pose = data
        if self._sp is not None:
            return self._sp(pose)
        root_v = self._jit_pred(pose)
        return add_trajectory(pose, root_v), root_v


def trajectory_losses(
    model: TrajectoryModel, params, batch, cfg: Config,
    mean_std: np.ndarray,
) -> Tuple[jnp.ndarray, dict]:
    """Training loss: L2 on normalised root_v + L2 on accumulated world
    trajectories (``use_accumulation_root_v``,
    ``trajectory_pred_model.py:237-244``).  Trajectories are accumulated on
    *de-standardised* velocities, as the reference does inside
    ``gen_motion_w_trajectory`` (``:292-294``)."""
    # compact-transfer path: joint positions are FK of the stored rotmats by
    # construction (process_all_data_motion.py:138-143), so they can be
    # derived on device from rot_mat alone
    if "joint_pos" not in batch:
        if "rot_mat" not in batch:
            # rot6d wire: Gram-Schmidt; aa wire: Rodrigues reconstruction
            rm = (rot.rot6d_to_rotmat(batch["rot_6d"])
                  if "rot_6d" in batch
                  else rot.aa_to_rotmat(batch["aa"].astype(jnp.float32)))
            batch = dict(batch, rot_mat=rm)
        pose = fk_mod.fk_from_rotmat(batch["rot_mat"], fk_mod.default_offsets())
        mean_c = jnp.asarray(mean_std[0][layout.COORD]).reshape(24, 3)
        std_c = jnp.asarray(np.where(mean_std[1][layout.COORD] == 0, 1,
                                     mean_std[1][layout.COORD])).reshape(24, 3)
        batch = dict(batch)
        batch["rot_pos"] = pose
        batch["joint_pos"] = (pose - mean_c) / std_c
        if "rot_6d" not in batch:
            batch["rot_6d"] = rot.rotmat_to_rot6d(batch["rot_mat"])
    inputs = (
        batch["joint_pos"] if cfg.model.trajectory_input_joint_pos
        else batch["rot_6d"]
    )
    root_v_gt = batch["root_v"]
    pred = model.apply(params, inputs)
    l_root_v = jnp.mean((pred - root_v_gt) ** 2)
    if cfg.model.use_accumulation_root_v:
        mean_rv = jnp.asarray(mean_std[0][layout.ROOT_V])
        std_rv = jnp.asarray(mean_std[1][layout.ROOT_V])
        pose = batch["rot_pos"]
        pred_w = add_trajectory(pose, mean_rv + std_rv * pred)
        gt_w = add_trajectory(pose, mean_rv + std_rv * root_v_gt)
        l_trans = jnp.mean((pred_w - gt_w) ** 2)
    else:
        l_trans = jnp.zeros(())
    total = cfg.loss.rec_root_v_w * l_root_v + cfg.loss.rec_root_trans_w * l_trans
    return total, {
        "loss_total": total,
        "loss_rec_root_v": l_root_v,
        "loss_rec_root_trans": l_trans,
    }
