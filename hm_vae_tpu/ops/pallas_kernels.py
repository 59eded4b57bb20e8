"""Pallas TPU kernels for the skeleton-op hot path.

``fused_conv_pool`` implements one full encoder level —
masked temporal conv (+bias) -> skeleton mean-pool -> LeakyReLU — as a single
VMEM-resident kernel:

- the conv is an im2col matmul: patches are assembled in VMEM scratch as a
  (C_in*K, T_out) panel via K static strided slices, then one
  (C_out, C_in*K) x (C_in*K, T_out) MXU dot — a single large contraction
  instead of K small ones;
- the pool matrix multiplies in the same kernel, so the conv activation never
  round-trips to HBM;
- the weight mask is pre-applied on the host side of the call (it is constant;
  masking at trace time costs one fused elementwise op).

Grid = batch.  All shapes in this model fit VMEM comfortably per batch
element (max level: x 336x78, W 672x5040, out 672x4).

Use :func:`benchmark_against_xla` to decide per-shape whether the fused kernel
or the XLA conv wins; `models.hm_vae` keeps XLA as the default path and this
kernel is opt-in (``use_pallas``) — honesty over novelty.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(x_ref, w_ref, b_ref, pool_ref, dec_ref, out_ref, patch_ref,
                  *, K: int, stride: int, T_out: int, C_in: int,
                  negative_slope: float, apply_pool: bool):
    # assemble the stride-1 im2col panel:
    # patch[(k*C_in):(k+1)*C_in, t] = x[:, t + k]  for t in [0, L)
    # (TPU vector lanes don't support strided extracts, so striding is applied
    # afterwards as a constant 0/1 decimation matmul — MXU work instead of an
    # unsupported lane-stride)
    L = stride * (T_out - 1) + 1
    for k in range(K):
        patch_ref[k * C_in:(k + 1) * C_in, :] = jax.lax.slice(
            x_ref[0], (0, k), (C_in, k + L))
    # bf16 operands (f32 accumulate): halves the weight panel's VMEM footprint
    # — the deepest level's (672, 5040) panel would not fit in f32 — and the
    # MXU multiplies f32 inputs at bf16 granularity by default anyway
    conv = jnp.dot(w_ref[:], patch_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # (C_out, L)
    if stride > 1:
        conv = jnp.dot(conv, dec_ref[:],
                       preferred_element_type=jnp.float32)  # (C_out, T_out)
    conv = conv + b_ref[:].reshape(-1, 1)
    if apply_pool:
        pooled = jnp.dot(pool_ref[:], conv,
                         preferred_element_type=jnp.float32)  # (P, T_out)
    else:
        pooled = conv
    out_ref[0] = jnp.where(pooled >= 0, pooled, negative_slope * pooled)


def fused_conv_pool(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    mask: jnp.ndarray,
    pool_matrix: Optional[jnp.ndarray],
    stride: int,
    padding: int,
    padding_mode: str = "reflect",
    negative_slope: float = 0.2,
) -> jnp.ndarray:
    """One encoder level in one Pallas kernel.

    x: (B, C_in, T); weight: (C_out, C_in, K); mask: (C_out, C_in);
    pool_matrix: (P, C_out) or None.  Returns (B, P, T_out) post-LeakyReLU.
    """
    from .skeleton_nn import pad_temporal

    B, C_in, _ = x.shape
    C_out, _, K = weight.shape
    x = pad_temporal(x, padding, padding_mode)
    T_pad = x.shape[-1]
    T_out = (T_pad - K) // stride + 1
    P = pool_matrix.shape[0] if pool_matrix is not None else C_out

    w_flat = (weight * mask[:, :, None]).transpose(0, 2, 1).reshape(C_out, K * C_in)
    w_flat = w_flat.astype(jnp.bfloat16)
    # weight layout must match patch layout: patch rows are (k, c_in) pairs
    # ordered k-major; transpose to (C_out, K, C_in) then flatten
    pool = pool_matrix if pool_matrix is not None else jnp.zeros((1, 1), x.dtype)
    L = stride * (T_out - 1) + 1
    dec = np.zeros((L, T_out), np.float32)
    dec[np.arange(T_out) * stride, np.arange(T_out)] = 1.0
    dec = jnp.asarray(dec)

    kernel = functools.partial(
        _fused_kernel, K=K, stride=stride, T_out=T_out, C_in=C_in,
        negative_slope=negative_slope, apply_pool=pool_matrix is not None,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, P, T_out), x.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C_in, T_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, K * C_in), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out,), lambda b: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(pool.shape, lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T_out), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, T_out), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K * C_in, L), jnp.float32)],
    )(x, w_flat, bias, pool, dec)


# note: patch rows are k-major ((k, c_in)); w_flat above transposes the weight
# to (C_out, K, C_in) so the contraction dimensions line up.


def benchmark_against_xla(level_shapes=None, iters: int = 50):
    """Measure fused kernel vs the XLA conv+pool path at model shapes.

    Returns {name: (t_pallas_ms, t_xla_ms)}.
    """
    import time

    from . import skeleton_nn as snn

    if level_shapes is None:
        # len-64 encoder levels: (B, C_in, T, C_out, K, stride, P)
        level_shapes = [
            ("enc0", 8, 144, 64, 288, 15, 2, 168),
            ("enc1", 8, 168, 32, 336, 15, 2, 216),
            ("enc2", 8, 216, 16, 432, 15, 2, 336),
            ("enc3", 8, 336, 8, 672, 15, 2, 672),
        ]
    results = {}
    for name, B, C_in, T, C_out, K, stride, P in level_shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, C_in, T))
        w = jax.random.normal(key, (C_out, C_in, K)) * 0.05
        b = jax.random.normal(key, (C_out,)) * 0.05
        mask = (jax.random.uniform(key, (C_out, C_in)) > 0.5).astype(x.dtype)
        pool = jax.random.normal(key, (P, C_out)) * 0.1
        pad = (K - 1) // 2

        f_pallas = jax.jit(lambda x: fused_conv_pool(
            x, w, b, mask, pool, stride, pad))

        def xla_path(x):
            y = snn.skeleton_conv(x, w, b, mask, stride, pad, "reflect")
            y = snn.apply_channel_matrix(y, pool)
            return snn.leaky_relu(y)

        f_xla = jax.jit(xla_path)

        # correctness (both paths use default MXU precision -> bf16-level agreement)
        err = float(jnp.max(jnp.abs(f_pallas(x) - f_xla(x))))
        scale = float(jnp.max(jnp.abs(f_xla(x))))
        assert err <= 0.02 * max(scale, 1.0), (name, err, scale)

        def t(f):
            # block_until_ready can return early through the axon relay
            # (BASELINE.md measurement trap): chain the calls through a
            # carried scalar so one final device->host readback fences ALL
            # of them, without paying a relay round-trip per call
            def chained(xx):
                def body(s, _):
                    return s + f(xx + 0.0 * s).sum(), None
                s, _ = jax.lax.scan(body, jnp.zeros(()), None, length=iters)
                return s
            cj = jax.jit(chained)
            float(cj(x))
            t0 = time.perf_counter()
            float(cj(x))
            return (time.perf_counter() - t0) / iters * 1e3

        results[name] = (t(f_pallas), t(f_xla), err)
    return results
