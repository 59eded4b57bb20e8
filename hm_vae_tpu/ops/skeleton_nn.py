"""Skeleton-aware NN primitives: masked temporal conv, pool/unpool, upsampling.

Functional jnp/lax ops consumed by the flax modules in ``models/``.  Design:

- ``skeleton_conv`` is a dense 1-D convolution whose weight is multiplied by a
  constant block 0/1 mask at call time — the masked-weight formulation of the
  reference (``skeleton.py:95-105``).  On TPU the conv lowers to an implicit
  im2col matmul on the MXU; with C <= 672 and T <= 128, one dense masked matmul
  beats any per-edge gather formulation (the mask rides along as a free
  elementwise fuse).
- pool/unpool are constant-matrix contractions (``skeleton.py:219-261``); XLA
  folds the constants and maps them to the MXU.
- ``linear_upsample_matrix`` reproduces ``nn.Upsample(mode='linear',
  align_corners=False)`` exactly as a precomputed (T_out, T_in) matrix so
  upsampling is also just a matmul with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pad_temporal(x: jnp.ndarray, padding: int, mode: str) -> jnp.ndarray:
    """Pad the trailing (time) axis of (B, C, T).

    ``mode``: 'reflect' or 'constant' (zeros), matching the reference's
    ``F.pad`` call (``skeleton.py:100``); 'reflection'/'zeros' aliases accepted.
    """
    if padding == 0:
        return x
    mode = {"reflection": "reflect", "zeros": "constant"}.get(mode, mode)
    pad_width = [(0, 0)] * (x.ndim - 1) + [(padding, padding)]
    return jnp.pad(x, pad_width, mode=mode)


def skeleton_conv(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    mask: jnp.ndarray,
    stride: int,
    padding: int,
    padding_mode: str = "reflect",
) -> jnp.ndarray:
    """Masked grouped-by-edge temporal convolution.

    Args:
      x: (B, C_in, T).
      weight: (C_out, C_in, K) trainable.
      bias: (C_out,) or None.
      mask: (C_out, C_in) constant 0/1 neighbourhood mask (broadcast over K).
      stride / padding / padding_mode: as the reference conv.

    Returns (B, C_out, T_out) with T_out = (T + 2p - K)//stride + 1.
    """
    return skeleton_conv_w(x, weight * mask[:, :, None], bias, stride,
                           padding, padding_mode)


def skeleton_conv_w(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    stride: int,
    padding: int,
    padding_mode: str = "reflect",
) -> jnp.ndarray:
    """Temporal conv with an already-masked (possibly pool/unpool-folded)
    weight — the kernel-level primitive behind :func:`skeleton_conv`."""
    x = pad_temporal(x, padding, padding_mode)
    out = jax.lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def skeleton_linear(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None,
    mask: jnp.ndarray,
) -> jnp.ndarray:
    """Masked dense layer over flattened per-edge features.

    x: (B, n_edges, in_per_edge) or (B, C_in); weight: (C_out, C_in);
    mask: (C_out, C_in) neighbourhood mask.  The reference's
    ``SkeletonLinear`` (``skeleton.py:108-156``; used by its offset-encoding
    path) as a pure function.
    """
    B = x.shape[0]
    flat = x.reshape(B, -1)
    out = flat @ (weight * mask).T
    if bias is not None:
        out = out + bias
    return out


def apply_channel_matrix(x: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Apply a constant (C_out, C_in) matrix over the channel axis of (B, C_in, T).

    Used for SkeletonPool / SkeletonUnpool (``skeleton.py:228-231, 258-261``).
    """
    return jnp.einsum("oc,bct->bot", matrix, x)


@functools.lru_cache(maxsize=None)
def linear_upsample_matrix(t_in: int, scale: int = 2) -> np.ndarray:
    """(T_out, T_in) matrix reproducing torch linear upsample, align_corners=False.

    Output sample i reads the input at src = (i + 0.5)/scale - 0.5, linearly
    interpolated with edge clamping — torch's half-pixel convention
    (used by the decoder at ``seq_two_hier_sa_vae.py:235-240``).
    """
    t_out = t_in * scale
    m = np.zeros((t_out, t_in), dtype=np.float32)
    for i in range(t_out):
        src = (i + 0.5) / scale - 0.5
        lo = int(np.floor(src))
        frac = src - lo
        lo_c = min(max(lo, 0), t_in - 1)
        hi_c = min(max(lo + 1, 0), t_in - 1)
        m[i, lo_c] += 1.0 - frac
        m[i, hi_c] += frac
    return m


def upsample_linear(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Temporal linear upsampling of (B, C, T) by an integer factor."""
    m = jnp.asarray(linear_upsample_matrix(x.shape[-1], scale))
    return jnp.einsum("ut,bct->bcu", m, x)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)
