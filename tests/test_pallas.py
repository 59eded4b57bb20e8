"""Pallas fused conv+pool kernel: correctness vs the XLA path.

Runs in interpreter mode so the test works on the CPU backend; the real-TPU
performance comparison lives in
``hm_vae_tpu.ops.pallas_kernels.benchmark_against_xla`` (see BASELINE.md:
parity with XLA at model shapes, dispatch-bound).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.ops import skeleton_nn as snn
from hm_vae_tpu.ops import pallas_kernels as pk


@pytest.mark.parametrize("stride", [1, 2])
def test_fused_conv_pool_matches_xla(monkeypatch, stride):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(pk.pl, "pallas_call", interp)

    rng = np.random.default_rng(0)
    B, C_in, T, C_out, K, P = 2, 12, 16, 24, 3, 14
    x = jnp.asarray(rng.normal(size=(B, C_in, T)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C_out, C_in, K)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(C_out,)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((C_out, C_in)) > 0.5).astype(np.float32))
    pool = jnp.asarray(rng.normal(size=(P, C_out)).astype(np.float32) * 0.2)
    pad = (K - 1) // 2

    ours = pk.fused_conv_pool(x, w, b, mask, pool, stride, pad, "reflect")
    ref = snn.leaky_relu(snn.apply_channel_matrix(
        snn.skeleton_conv(x, w, b, mask, stride, pad, "reflect"), pool))
    # kernel uses bf16 operands (matching TPU MXU default granularity)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=0.02 * float(jnp.abs(ref).max()))
    assert ours.shape == ref.shape
