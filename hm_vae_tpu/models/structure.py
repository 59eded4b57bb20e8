"""Static per-level architecture metadata for the hierarchical VAE.

Derives — once, at trace time — every shape/stride/mask/matrix the encoder and
decoder need, mirroring the constructor logic of the reference
(``seq_two_hier_sa_vae.py:53-141`` encoder, ``:169-258`` decoder) including the
train_seq_len 8/16 special-case stride/timestep schedules
(``seq_two_hier_sa_vae.py:79-91, 107-118, 187-200, 233-240``).

All arrays are numpy constants; flax modules fetch this object through an
``lru_cache`` keyed on the frozen config so identical configs share one
instance (identity-hashable, safe as a static attribute).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import numpy as np

from ..ops import topology as tp
from ..utils.config import ModelConfig


@dataclasses.dataclass(eq=False)
class ConvSpec:
    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    padding_mode: str          # 'reflect' | 'constant'
    bias: bool
    mask: np.ndarray           # (C_out, C_in)
    # fan-in per output block for the per-block kaiming-uniform init
    # (skeleton.py:70-89): bound[i] applies to out-channel block i
    block_bounds: np.ndarray   # (n_edges,) float
    n_edges: int


@dataclasses.dataclass(eq=False)
class EncoderLevel:
    conv: ConvSpec
    pool_matrix: np.ndarray        # (k_edges*cpe, n_edges*cpe)
    pooled_edges: int
    latent_in: int                 # channel_base[i+1] * timestep_out
    latent_out: int                # 2 * (shallow_)latent_d
    timestep_out: int
    # cfg.extra_conv stride-1 in->in SkeletonConvs applied BEFORE the strided
    # conv, with no activation in between (seq_two_hier_sa_vae.py:102-105)
    extra_convs: List[ConvSpec] = dataclasses.field(default_factory=list)


@dataclasses.dataclass(eq=False)
class DecoderLevel:
    upsample: bool
    unpool_matrix: np.ndarray      # (n_edges*cpe, k_edges*cpe)
    conv: ConvSpec
    leaky: bool
    latent_in: int                 # z dim for this hier feat
    latent_out: int                # channel_base * timestep
    timestep: int                  # temporal length of this level's hier feat
    z_edges: int                   # edge count of the consumed z vector
    # cfg.extra_conv stride-1 in->in SkeletonConvs between the unpool and the
    # main conv (seq_two_hier_sa_vae.py:244-249); bias follows the level flag
    extra_convs: List[ConvSpec] = dataclasses.field(default_factory=list)


class HMVAEStructure:
    """Encoder/decoder cascade metadata for one :class:`ModelConfig`."""

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        nl = cfg.num_layers
        casc = tp.get_cascade(tp.SMPL24_PARENTS, nl, cfg.skeleton_dist)
        self.cascade = casc
        pad_mode = {"reflection": "reflect", "zeros": "constant"}.get(
            cfg.padding_mode, cfg.padding_mode
        )
        k = cfg.kernel_size
        padding = (k - 1) // 2

        # channel_base: 6, 12, 24, 48, 96 (input_dim doubling per level)
        self.channel_base = [cfg.input_dim]
        for _ in range(nl):
            self.channel_base.append(self.channel_base[-1] * 2)

        # encoder timestep schedule (incl. len-8/16 special cases)
        T = cfg.train_seq_len
        self.enc_timesteps = [T]
        self.enc_strides: List[int] = []
        for i in range(nl):
            if T == 8:
                stride = 1 if (i == 0 or i == nl - 1) else 2
            elif T == 16:
                stride = 1 if i == 0 else 2
            else:
                stride = 2
            self.enc_strides.append(stride)
            self.enc_timesteps.append(self.enc_timesteps[-1] // stride)

        # encoder channel_list: 6*24, 12*24->pool..., as flat channel counts
        self.channel_list = [self.channel_base[0] * casc.edge_num[0]]
        self.encoder_levels: List[EncoderLevel] = []
        for i in range(nl):
            n_edges = casc.edge_num[i]
            in_ch = self.channel_base[i] * n_edges
            out_ch = self.channel_base[i + 1] * n_edges
            self.channel_list.append(out_ch)
            mask = tp.conv_channel_mask(
                casc.neighbours[i], self.channel_base[i], self.channel_base[i + 1]
            )
            bounds = _block_bounds(casc.neighbours[i], self.channel_base[i], k)
            conv = ConvSpec(
                in_channels=in_ch, out_channels=out_ch, kernel_size=k,
                stride=self.enc_strides[i], padding=padding,
                padding_mode=pad_mode, bias=True, mask=mask,
                block_bounds=bounds, n_edges=n_edges,
            )
            extras = [
                _extra_conv_spec(casc.neighbours[i], self.channel_base[i],
                                 k, padding, pad_mode, True, n_edges)
                for _ in range(cfg.extra_conv)
            ]
            cpe = out_ch // n_edges
            pool_m = tp.pooling_matrix(casc.pooling_lists[i], n_edges, cpe)
            latent_out = 2 * (cfg.shallow_latent_d if i == 0 else cfg.latent_d)
            self.encoder_levels.append(EncoderLevel(
                conv=conv, pool_matrix=pool_m,
                pooled_edges=casc.pooled_edge_num[i],
                latent_in=self.channel_base[i + 1] * self.enc_timesteps[i + 1],
                latent_out=latent_out,
                timestep_out=self.enc_timesteps[i + 1],
                extra_convs=extras,
            ))

        # z vector edge counts, shallow -> deep (e.g. 14, 9, 7, 7)
        self.z_edges = [lvl.pooled_edges for lvl in self.encoder_levels]
        self.z_dims = [
            cfg.shallow_latent_d if i == 0 else cfg.latent_d for i in range(nl)
        ]

        # decoder timestep schedule = reversed encoder schedule
        self.dec_timesteps = list(reversed(self.enc_timesteps))  # e.g. 4,8,16,32,64

        self.decoder_levels: List[DecoderLevel] = []
        for i in range(nl):
            enc_idx = nl - i - 1
            n_edges = casc.edge_num[enc_idx]
            if i == nl - 1:
                in_ch = self.channel_list[nl - i] * 2
                out_ch = in_ch // 4
            else:
                in_ch = self.channel_list[nl - i]
                out_ch = in_ch // 2
            if T == 8:
                upsample = (i != nl - 1 and i != 0)
            elif T == 16:
                upsample = (i != nl - 1)
            else:
                upsample = True
            bias = not (i != 0 and i != nl - 1)
            in_cpe = in_ch // n_edges
            out_cpe = out_ch // n_edges
            mask = tp.conv_channel_mask(casc.neighbours[enc_idx], in_cpe, out_cpe)
            bounds = _block_bounds(casc.neighbours[enc_idx], in_cpe, k)
            conv = ConvSpec(
                in_channels=in_ch, out_channels=out_ch, kernel_size=k,
                stride=1, padding=padding, padding_mode=pad_mode, bias=bias,
                mask=mask, block_bounds=bounds, n_edges=n_edges,
            )
            unpool_m = tp.unpooling_matrix(casc.pooling_lists[enc_idx], in_cpe)
            extras = [
                _extra_conv_spec(casc.neighbours[enc_idx], in_cpe,
                                 k, padding, pad_mode, bias, n_edges)
                for _ in range(cfg.extra_conv)
            ]
            # hier feat for this level consumes z_vec_list[nl - i - 1]
            z_idx = nl - i - 1
            self.decoder_levels.append(DecoderLevel(
                upsample=upsample, unpool_matrix=unpool_m, conv=conv,
                leaky=(i != nl - 1),
                latent_in=self.z_dims[z_idx],
                latent_out=self.channel_base[nl - i] * self.dec_timesteps[i],
                timestep=self.dec_timesteps[i],
                z_edges=self.z_edges[z_idx],
                extra_convs=extras,
            ))

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def _extra_conv_spec(neighbours, cpe: int, kernel: int, padding: int,
                     pad_mode: str, bias: bool, n_edges: int) -> ConvSpec:
    """Stride-1, channel-preserving SkeletonConv spec for ``extra_conv``
    (seq_two_hier_sa_vae.py:102-105 encoder, :244-249 decoder)."""
    return ConvSpec(
        in_channels=cpe * n_edges, out_channels=cpe * n_edges,
        kernel_size=kernel, stride=1, padding=padding, padding_mode=pad_mode,
        bias=bias, mask=tp.conv_channel_mask(neighbours, cpe, cpe),
        block_bounds=_block_bounds(neighbours, cpe, kernel),
        n_edges=n_edges,
    )


def _block_bounds(neighbours, in_cpe: int, kernel: int) -> np.ndarray:
    """Per-edge kaiming-uniform bound 1/sqrt(fan_in_block).

    kaiming_uniform(a=sqrt(5)) on a (out_cpe, len(nbrs)*in_cpe, K) slice has
    bound sqrt(3)*sqrt(2/(1+5))/sqrt(fan_in) = 1/sqrt(fan_in) with
    fan_in = len(nbrs)*in_cpe*K — the reference's masked-slice init
    (skeleton.py:70-89).  The bias bound is identical.
    """
    return np.asarray(
        [1.0 / np.sqrt(len(n) * in_cpe * kernel) for n in neighbours],
        dtype=np.float32,
    )


@functools.lru_cache(maxsize=None)
def get_structure(cfg: ModelConfig) -> HMVAEStructure:
    return HMVAEStructure(cfg)


# --------------------------------------------------------------------------
# Trajectory-model structure: same conv/pool cascade but stride 1 everywhere
# and no latent heads (trajectory_pred_model.py:45-115).
# --------------------------------------------------------------------------

@dataclasses.dataclass(eq=False)
class TrajectoryLevel:
    conv: ConvSpec
    pool_matrix: np.ndarray
    pooled_edges: int


class TrajectoryStructure:
    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        nl = cfg.num_layers
        casc = tp.get_cascade(tp.SMPL24_PARENTS, nl, cfg.skeleton_dist)
        self.cascade = casc
        pad_mode = {"reflection": "reflect", "zeros": "constant"}.get(
            cfg.padding_mode, cfg.padding_mode
        )
        k = cfg.kernel_size
        padding = (k - 1) // 2
        base0 = 3 if cfg.trajectory_input_joint_pos else cfg.input_dim
        self.channel_base = [base0]
        for _ in range(nl):
            self.channel_base.append(self.channel_base[-1] * 2)
        self.d_model = self.channel_base[-1]

        self.levels: List[TrajectoryLevel] = []
        for i in range(nl):
            n_edges = casc.edge_num[i]
            in_ch = self.channel_base[i] * n_edges
            out_ch = self.channel_base[i + 1] * n_edges
            mask = tp.conv_channel_mask(
                casc.neighbours[i], self.channel_base[i], self.channel_base[i + 1]
            )
            bounds = _block_bounds(casc.neighbours[i], self.channel_base[i], k)
            conv = ConvSpec(
                in_channels=in_ch, out_channels=out_ch, kernel_size=k,
                stride=1, padding=padding, padding_mode=pad_mode, bias=True,
                mask=mask, block_bounds=bounds, n_edges=n_edges,
            )
            cpe = out_ch // n_edges
            pool_m = tp.pooling_matrix(casc.pooling_lists[i], n_edges, cpe)
            self.levels.append(TrajectoryLevel(
                conv=conv, pool_matrix=pool_m,
                pooled_edges=casc.pooled_edge_num[i],
            ))
        self.out_edges = self.levels[-1].pooled_edges  # 7

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@functools.lru_cache(maxsize=None)
def get_trajectory_structure(cfg: ModelConfig) -> TrajectoryStructure:
    return TrajectoryStructure(cfg)
