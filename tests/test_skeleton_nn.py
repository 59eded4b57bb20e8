"""Masked conv / pool / unpool / upsample op tests, incl. torch oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from hm_vae_tpu.ops import skeleton_nn as snn
from hm_vae_tpu.ops import topology as tp


def test_pad_reflect_matches_numpy():
    x = jnp.arange(2 * 3 * 5, dtype=jnp.float32).reshape(2, 3, 5)
    out = np.asarray(snn.pad_temporal(x, 2, "reflection"))
    ref = np.pad(np.asarray(x), ((0, 0), (0, 0), (2, 2)), mode="reflect")
    np.testing.assert_allclose(out, ref)


@pytest.mark.parametrize("stride,k,t", [(1, 15, 64), (2, 15, 64), (2, 3, 8), (1, 31, 128)])
def test_conv_matches_torch(stride, k, t):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, C_in, C_out = 2, 12, 24
    x = rng.normal(size=(B, C_in, t)).astype(np.float32)
    w = rng.normal(size=(C_out, C_in, k)).astype(np.float32)
    b = rng.normal(size=(C_out,)).astype(np.float32)
    mask = (rng.random((C_out, C_in)) > 0.5).astype(np.float32)
    pad = (k - 1) // 2

    ours = np.asarray(
        snn.skeleton_conv(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          jnp.asarray(mask), stride, pad, "reflect")
    )

    tx = torch.nn.functional.pad(torch.from_numpy(x), (pad, pad), mode="reflect")
    tw = torch.from_numpy(w * mask[:, :, None])
    ref = torch.nn.functional.conv1d(tx, tw, torch.from_numpy(b), stride=stride)
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-4)
    assert ours.shape[-1] == (t + 2 * pad - k) // stride + 1


def test_mask_actually_blocks_information():
    # zero mask column -> output independent of that input channel
    rng = np.random.default_rng(1)
    B, C, T, K = 1, 4, 10, 3
    w = rng.normal(size=(C, C, K)).astype(np.float32)
    mask = np.ones((C, C), dtype=np.float32)
    mask[0, 3] = 0.0
    x1 = rng.normal(size=(B, C, T)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 3, :] += 100.0
    o1 = np.asarray(snn.skeleton_conv(jnp.asarray(x1), jnp.asarray(w), None,
                                      jnp.asarray(mask), 1, 1, "constant"))
    o2 = np.asarray(snn.skeleton_conv(jnp.asarray(x2), jnp.asarray(w), None,
                                      jnp.asarray(mask), 1, 1, "constant"))
    np.testing.assert_allclose(o1[:, 0], o2[:, 0], atol=1e-5)
    assert np.abs(o1[:, 1] - o2[:, 1]).max() > 1.0


def test_pool_unpool_channel_matrix():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)
    _, pool, _ = tp.pool_edges(edges)
    c = 12
    W = jnp.asarray(tp.pooling_matrix(pool, 24, c))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 24 * c, 5)).astype(np.float32))
    y = snn.apply_channel_matrix(x, W)
    assert y.shape == (3, 14 * c, 5)
    # pooled edge 1 = mean of edges 1 and 4
    np.testing.assert_allclose(
        np.asarray(y)[:, c:2 * c],
        (np.asarray(x)[:, c:2 * c] + np.asarray(x)[:, 4 * c:5 * c]) / 2,
        atol=1e-6,
    )


@pytest.mark.parametrize("t_in", [4, 8, 16, 32])
def test_upsample_matches_torch(t_in):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 6, t_in)).astype(np.float32)
    ours = np.asarray(snn.upsample_linear(jnp.asarray(x), 2))
    up = torch.nn.Upsample(scale_factor=2, mode="linear", align_corners=False)
    ref = up(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_leaky_relu():
    x = jnp.asarray([-2.0, -0.5, 0.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(snn.leaky_relu(x)), [-0.4, -0.1, 0.0, 1.0], atol=1e-7
    )


def test_skeleton_linear_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(5)
    B, C_in, C_out = 3, 12, 8
    x = rng.normal(size=(B, 4, 3)).astype(np.float32)  # 4 edges x 3 per edge
    w = rng.normal(size=(C_out, C_in)).astype(np.float32)
    b = rng.normal(size=(C_out,)).astype(np.float32)
    mask = (rng.random((C_out, C_in)) > 0.4).astype(np.float32)
    ours = np.asarray(snn.skeleton_linear(jnp.asarray(x), jnp.asarray(w),
                                          jnp.asarray(b), jnp.asarray(mask)))
    ref = torch.nn.functional.linear(
        torch.from_numpy(x.reshape(B, -1)), torch.from_numpy(w * mask),
        torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)
