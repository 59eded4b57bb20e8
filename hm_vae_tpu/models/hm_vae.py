"""Two-level hierarchical skeleton-aware sequence VAE (flax).

TPU-first re-design of the reference ``TwoHierSAVAEModel``
(``seq_two_hier_sa_vae.py:53-474``):

- all topology/pooling/mask data are compile-time constants
  (:mod:`hm_vae_tpu.models.structure`);
- the model is a *pure* flax module — no losses, no ``.cuda()``, no
  ``backward()`` inside forward (the reference's DataParallel idiom,
  ``seq_two_hier_sa_vae.py:413-414``, is replaced by ``jax.value_and_grad``
  over a pjit-sharded step in ``train/``);
- reparametrization / KL-curriculum / losses live in pure functions
  (:mod:`hm_vae_tpu.train.losses`) so the same module serves train, eval and
  test-time latent optimization.

Hierarchical latents (shallow -> deep), e.g. for len-64/SMPL-24:
``[(B,14,2*shallow_d), (B,9,2*latent_d), (B,7,2*latent_d), (B,7,2*latent_d)]``.
The decoder consumes only the deepest z (seeds level 0) and the shallowest z
(channel-concat at the last level, ``seq_two_hier_sa_vae.py:278-288``); the two
middle latents are decoded-but-ignored, kept for API parity (zeros at test
time, ``:804-817``).

Init parity note: the reference's ``weights_init`` only rebinds modules whose
class name *starts with* Conv/Linear (``trainer_motion_vae.py:264-283``), so
SkeletonConv keeps its per-block kaiming-uniform(a=sqrt(5)) init while the
plain latent Linears get the scheme named by the YAML `init` key
(gaussian/xavier/kaiming/orthogonal/default — see :func:`dense_kernel_init`)
with zero bias.  Both are reproduced here.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import skeleton_nn as snn
from ..utils.config import ModelConfig
from . import param_layout as pl
from .structure import ConvSpec, get_structure


def _skeleton_conv_weight_init(spec: ConvSpec):
    """Per-edge-block kaiming-uniform init over masked slices.

    Block ``i`` of the output channels draws U(-b_i, b_i) with
    ``b_i = 1/sqrt(fan_in_block_i)``; masked-out entries are irrelevant (the
    mask zeroes them every call) but get drawn too, which is harmless.
    """
    bounds = np.repeat(
        spec.block_bounds, spec.out_channels // spec.n_edges
    )[:, None, None]  # (C_out, 1, 1)

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype, -1.0, 1.0)
        return u * jnp.asarray(bounds, dtype)

    return init


def _skeleton_conv_compact_weight_init(spec: ConvSpec):
    """Same distribution as :func:`_skeleton_conv_weight_init`, drawn only
    for the mask-live (L, K) rows of the compact layout."""
    bounds = pl.compact_meta(spec).row_bounds[:, None]  # (L, 1)

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype, -1.0, 1.0)
        return u * jnp.asarray(bounds, dtype)

    return init


def _skeleton_conv_bias_init(spec: ConvSpec):
    bounds = np.repeat(spec.block_bounds, spec.out_channels // spec.n_edges)

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, dtype, -1.0, 1.0)
        return u * jnp.asarray(bounds, dtype)

    return init


def dense_kernel_init(init_type: str = "kaiming"):
    """The trainer's ``weights_init`` dispatch (trainer_motion_vae.py:264-283).

    The reference re-initializes every module whose class name *starts with*
    ``Conv`` or ``Linear`` — so the plain latent ``nn.Linear`` heads are hit
    while ``SkeletonConv``/``SkeletonLinear`` (prefixed ``Skeleton``) keep
    their construction-time per-block kaiming-uniform init.  This mirrors
    that: it only feeds the latent Dense heads.  Bias is zeroed for every
    branch, including ``default`` (trainer_motion_vae.py:281-282).

    torch -> jax std equivalences (torch weight is (out, in); flax kernel is
    (in, out); fan_in matches either way):
      gaussian   normal_(0, 0.02)                 -> normal(0.02)
      xavier     xavier_normal_(gain=sqrt(2)):    std = 2/sqrt(fi+fo)
                 = variance_scaling(2.0, fan_avg, normal)
      kaiming    kaiming_normal_(a=0, fan_in):    std = sqrt(2/fi)
                 = variance_scaling(2.0, fan_in, normal)
      orthogonal orthogonal_(gain=sqrt(2))        -> orthogonal(sqrt(2))
                 (semi-orthogonal up to transpose convention)
      default    torch Linear kaiming_uniform(a=sqrt(5)): bound = 1/sqrt(fi)
                 = variance_scaling(1/3, fan_in, uniform)
    """
    if init_type == "gaussian":
        return nn.initializers.normal(stddev=0.02)
    if init_type == "xavier":
        return nn.initializers.variance_scaling(2.0, "fan_avg", "normal")
    if init_type == "kaiming":
        return nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    if init_type == "orthogonal":
        return nn.initializers.orthogonal(scale=math.sqrt(2.0))
    if init_type == "default":
        return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
    raise ValueError(
        f"unsupported init: {init_type!r} "
        "(expected gaussian|xavier|kaiming|orthogonal|default)")


class SkeletonConv(nn.Module):
    """Masked grouped-by-edge temporal conv over (B, C, T).

    ``pool_matrix`` / ``unpool_matrix`` fold an adjacent constant channel map
    into the conv weight at apply time: pool/unpool are channel-only linear
    maps, so ``pool(conv(x)) == conv'(x)`` with ``W' = P @ (W*mask)`` and
    ``conv(unpool(x)) == conv''(x)`` with ``W'' = (W*mask) @ U`` — exactly the
    reference's Sequential semantics (``seq_two_hier_sa_vae.py:94-133,
    233-260``) with one fewer op per level, a smaller conv output (pool) or
    input (unpool), and ~40% fewer MXU FLOPs.  The fold itself is a tiny
    matmul on the weight.  Parameters/state-dict layout are unchanged.
    """

    spec: ConvSpec = None
    compute_dtype: str = "float32"
    pool_matrix: object = None      # (Q, C_out) — SkeletonPool after the conv
    unpool_matrix: object = None    # (C_in, P) — SkeletonUnpool before it
    # "dense": (C_out, C_in, K) weight, mask applied at call time;
    # "compact": only the mask-live (L, K) rows are stored and the dense
    # weight is rebuilt by a constant gather (exact-zero dead entries, no
    # mask multiply) — function-exact, ~21% less param HBM traffic on the
    # len-64 flagship (models/param_layout.py)
    param_layout: str = "dense"
    # rank-r low-rank adapter IN FOLDED WEIGHT SPACE (test-time decoder
    # fine-tuning, apps/latent_opt.py): declares lora_a (out_f, r) zero-init
    # and lora_b (r, in_f, K), and adds the delta's contribution as a SPLIT
    # conv — out += A @ conv(x, B) — so the dense folded weight is never
    # re-materialized per adapter state.  lora_a == 0 makes the module
    # function-identical to the base conv.  0 (all training paths): no extra
    # params, byte-identical behaviour.
    lora_rank: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.spec
        compact = pl.is_compact_spec(s, self.param_layout)
        if compact:
            w = self.param(
                "weight_c", _skeleton_conv_compact_weight_init(s),
                (pl.compact_meta(s).n_live, s.kernel_size),
            )
        else:
            w = self.param(
                "weight", _skeleton_conv_weight_init(s),
                (s.out_channels, s.in_channels, s.kernel_size),
            )
        b = (
            self.param("bias", _skeleton_conv_bias_init(s), (s.out_channels,))
            if s.bias else None
        )
        # compute dtype: bf16 compute casts x+w down (mixed precision — the
        # conv weights dominate HBM traffic on this model); f32 compute casts
        # a bf16-STORED weight (OptimConfig.param_dtype) up after the halved
        # HBM read — lax.conv requires matching operand dtypes either way
        cd = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        if x.dtype != cd or w.dtype != cd:
            x = x.astype(cd)
            w = w.astype(cd)
            b = b.astype(cd) if b is not None else None
        if compact:
            wm = pl.expander(s)(w)
        elif s.mask.all():
            # fully-dense level (deep cascade levels: a skeleton_dist-2
            # neighbourhood spans the whole pooled graph) — the mask multiply
            # would be an identity costing a full weight read+write
            wm = w
        else:
            mask = jnp.asarray(s.mask, w.dtype)
            wm = w * mask[:, :, None]
        if self.unpool_matrix is not None:
            U = jnp.asarray(self.unpool_matrix, wm.dtype)
            wm = jnp.einsum("ock,cp->opk", wm, U)
        if self.pool_matrix is not None:
            P = jnp.asarray(self.pool_matrix, wm.dtype)
            wm = jnp.einsum("qo,ock->qck", P, wm)
            b = P @ b if b is not None else None
        out = snn.skeleton_conv_w(x, wm, b, s.stride, s.padding,
                                  s.padding_mode)
        if self.lora_rank > 0:
            # delta in FOLDED space: the effective weight is wm + A@B (A
            # zero-init -> exact base function at start).  Linearity of conv
            # in the weight lets the delta ride a separate r-channel conv:
            # conv(x, wm + AB) == conv(x, wm) + A @ conv(x, B) — the dense
            # (out_f, in_f, K) weight is read once per iteration for ALL
            # adapter states, while the per-state work is O(r).
            out_f, in_f = wm.shape[0], wm.shape[1]
            la = self.param("lora_a", nn.initializers.zeros,
                            (out_f, self.lora_rank))
            # B side: uniform(+-1/sqrt(in_f*K)) — the folded fan-in, so the
            # r-channel conv's outputs start at the base conv's activation
            # scale (lora_a==0 keeps the function exact regardless; this only
            # conditions the first A gradients)
            lb_bound = 1.0 / math.sqrt(in_f * s.kernel_size)

            def _lb_init(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype,
                                          -lb_bound, lb_bound)

            lb = self.param("lora_b", _lb_init,
                            (self.lora_rank, in_f, s.kernel_size))
            lo = snn.skeleton_conv_w(x, lb.astype(cd), None, s.stride,
                                     s.padding, s.padding_mode)
            out = out + jnp.einsum("or,brt->bot", la.astype(cd), lo)
        return out


class Encoder(nn.Module):
    """4-level skeleton conv/pool encoder with per-level latent heads.

    Input: (B, n_joints*input_dim, T).  Returns the deepest feature map and the
    list of per-level latent stats (B, k_edges, 2*latent_d), shallow->deep.
    """

    cfg: ModelConfig
    init_type: str = "kaiming"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        st = get_structure(self.cfg)
        z_stats: List[jnp.ndarray] = []
        for i, lvl in enumerate(st.encoder_levels):
            # extra_conv: stride-1 convs ahead of the strided conv, with no
            # activation between them (seq_two_hier_sa_vae.py:102-105)
            for e, espec in enumerate(lvl.extra_convs):
                x = SkeletonConv(espec, self.cfg.compute_dtype,
                                 param_layout=self.cfg.param_layout,
                                 name=f"conv_{i}_extra_{e}")(x)
            # SkeletonPool folded into the conv weight (exact linear-map fusion)
            x = SkeletonConv(lvl.conv, self.cfg.compute_dtype,
                             pool_matrix=lvl.pool_matrix,
                             param_layout=self.cfg.param_layout,
                             name=f"conv_{i}")(x)
            x = snn.leaky_relu(x, 0.2)
            x = x.astype(jnp.float32)  # latent heads and stats stay f32
            B = x.shape[0]
            # (B, k_edges*cpe, T') -> (B, k_edges, cpe*T')
            per_edge = x.reshape(B, lvl.pooled_edges, -1)
            head = nn.Dense(
                lvl.latent_out, kernel_init=dense_kernel_init(self.init_type),
                bias_init=nn.initializers.zeros, name=f"latent_head_{i}",
            )
            z_stats.append(head(per_edge))
        return x, z_stats


class Decoder(nn.Module):
    """Mirror decoder: latent re-inflation + upsample/unpool/conv per level.

    Takes the z list (shallow->deep) and returns (B, n_joints*output_dim, T).
    """

    cfg: ModelConfig
    init_type: str = "kaiming"

    @nn.compact
    def __call__(self, z_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
        st = get_structure(self.cfg)
        nl = self.cfg.num_layers
        B = z_list[0].shape[0]

        # hier feats, deep -> shallow order (decoder consumes reversed z list)
        hier_feats: List[jnp.ndarray] = []
        for i, lvl in enumerate(st.decoder_levels):
            z = z_list[nl - i - 1]  # (B, k_edges, latent_in)
            feats = nn.Dense(
                lvl.latent_out, kernel_init=dense_kernel_init(self.init_type),
                bias_init=nn.initializers.zeros, name=f"latent_dec_{i}",
            )(z)
            hier_feats.append(feats.reshape(B, -1, lvl.timestep))

        x = None
        for i, lvl in enumerate(st.decoder_levels):
            if i == 0:
                x = hier_feats[0]
            elif i == nl - 1:
                # channel-concat the shallow latent feats per edge
                # (seq_two_hier_sa_vae.py:280-288)
                k_edges = lvl.conv.n_edges  # post-unpool edges != pre-concat!
                # pre-unpool edge count at this point:
                pre_edges = st.cascade.pooled_edge_num[0]  # e.g. 14
                T_i = x.shape[-1]
                a = x.reshape(B, pre_edges, -1, T_i)
                b = hier_feats[i].reshape(B, pre_edges, -1, T_i)
                x = jnp.concatenate((a, b), axis=2).reshape(B, -1, T_i)
            if lvl.upsample:
                # on the pooled (narrower) channels — unpool commutes with the
                # time-only upsample and is folded into the conv below
                x = snn.upsample_linear(x, 2)
            if lvl.extra_convs:
                # extra_conv sits between the unpool and the main conv
                # (seq_two_hier_sa_vae.py:244-249): materialize the unpool
                x = snn.apply_channel_matrix(
                    x, jnp.asarray(lvl.unpool_matrix, x.dtype))
                for e, espec in enumerate(lvl.extra_convs):
                    x = SkeletonConv(espec, self.cfg.compute_dtype,
                                     param_layout=self.cfg.param_layout,
                                     lora_rank=self.cfg.lora_rank,
                                     name=f"conv_{i}_extra_{e}")(x)
                x = SkeletonConv(lvl.conv, self.cfg.compute_dtype,
                                 param_layout=self.cfg.param_layout,
                                 lora_rank=self.cfg.lora_rank,
                                 name=f"conv_{i}")(x)
            else:
                # SkeletonUnpool folded into the conv weight
                x = SkeletonConv(lvl.conv, self.cfg.compute_dtype,
                                 unpool_matrix=lvl.unpool_matrix,
                                 param_layout=self.cfg.param_layout,
                                 lora_rank=self.cfg.lora_rank,
                                 name=f"conv_{i}")(x)
            if lvl.leaky:
                x = snn.leaky_relu(x, 0.2)
        return x


class HMVAE(nn.Module):
    """Hierarchical skeleton-aware VAE: encode to z stats, decode z lists."""

    cfg: ModelConfig
    # weights_init scheme for the latent Dense heads (OptimConfig.init;
    # reference flat-YAML key `init`, configs/len64_no_aug_hm_vae.yaml:11)
    init_type: str = "kaiming"

    def setup(self):
        self.encoder = Encoder(self.cfg, self.init_type)
        self.decoder = Decoder(self.cfg, self.init_type)

    def __call__(self, x6d: jnp.ndarray):
        """x6d: (B, T, n_joints, 6) -> (z_stats list, decoder out of means).

        Only used for init/shape-checking; training uses encode/decode.
        """
        _, z_stats = self.encode(x6d)
        z_means = [split_stats(s, self.cfg, i)[0] for i, s in enumerate(z_stats)]
        return z_stats, self.decode(z_means)

    def encode(self, x6d: jnp.ndarray):
        """x6d: (B, T, n_joints, 6) -> (deep feature, z stats list)."""
        B, T, J, D = x6d.shape
        x = x6d.reshape(B, T, J * D).transpose(0, 2, 1)  # (B, C, T)
        return self.encoder(x)

    def decode(self, z_list: Sequence[jnp.ndarray]) -> jnp.ndarray:
        """z list (shallow->deep) -> 6D output (B, T, n_joints, output_dim)."""
        out = self.decoder(z_list).astype(jnp.float32)  # (B, J*out_dim, T)
        B = out.shape[0]
        T = out.shape[-1]
        return out.transpose(0, 2, 1).reshape(
            B, T, self.cfg.n_joints, self.cfg.output_dim
        )


def split_stats(stats: jnp.ndarray, cfg: ModelConfig, level: int):
    """(B, k, 2*d) -> (mu, logvar), d = shallow_latent_d at level 0."""
    d = cfg.shallow_latent_d if level == 0 else cfg.latent_d
    return stats[..., :d], stats[..., d:]


def reparametrize(key, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """z = mu + eps * exp(logvar/2) (seq_two_hier_sa_vae.py:419-423)."""
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * jnp.exp(0.5 * logvar)


def prior_z_list(key, cfg: ModelConfig, batch: int) -> List[jnp.ndarray]:
    """Sample z ~ N(0, I) for deep+shallow, zeros for the unused middles.

    Mirrors the test-time sampling layout (seq_two_hier_sa_vae.py:798-817).
    """
    st = get_structure(cfg)
    keys = jax.random.split(key, cfg.num_layers)
    zs = []
    for i in range(cfg.num_layers):
        shape = (batch, st.z_edges[i], st.z_dims[i])
        if i == 0 or i == cfg.num_layers - 1:
            zs.append(jax.random.normal(keys[i], shape))
        else:
            zs.append(jnp.zeros(shape))
    return zs
