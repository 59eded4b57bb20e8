"""Model-level tests: shapes, hierarchy structure, invariants, init stats."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.models.hm_vae import HMVAE, prior_z_list, split_stats
from hm_vae_tpu.models.structure import get_structure
from hm_vae_tpu.utils.config import ModelConfig

LEN64 = ModelConfig(latent_d=24, shallow_latent_d=12, kernel_size=15, train_seq_len=64)
LEN8 = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3, train_seq_len=8)
LEN16 = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3, train_seq_len=16)


def test_structure_len64():
    st = get_structure(LEN64)
    assert st.channel_base == [6, 12, 24, 48, 96]
    assert st.enc_timesteps == [64, 32, 16, 8, 4]
    assert st.channel_list == [144, 288, 336, 432, 672]
    assert st.z_edges == [14, 9, 7, 7]
    assert [l.conv.in_channels for l in st.encoder_levels] == [144, 168, 216, 336]
    assert [l.conv.out_channels for l in st.encoder_levels] == [288, 336, 432, 672]
    assert [l.latent_in for l in st.encoder_levels] == [12 * 32, 24 * 16, 48 * 8, 96 * 4]
    # decoder
    assert st.dec_timesteps == [4, 8, 16, 32, 64]
    assert [l.conv.in_channels for l in st.decoder_levels] == [672, 432, 336, 576]
    assert [l.conv.out_channels for l in st.decoder_levels] == [336, 216, 168, 144]
    assert [l.conv.bias for l in st.decoder_levels] == [True, False, False, True]
    assert [l.upsample for l in st.decoder_levels] == [True] * 4
    assert [l.latent_out for l in st.decoder_levels] == [96 * 4, 48 * 8, 24 * 16, 12 * 32]


def test_structure_len8_len16_schedules():
    st8 = get_structure(LEN8)
    assert st8.enc_timesteps == [8, 8, 4, 2, 2]
    assert st8.enc_strides == [1, 2, 2, 1]
    assert [l.upsample for l in st8.decoder_levels] == [False, True, True, False]
    st16 = get_structure(LEN16)
    assert st16.enc_timesteps == [16, 16, 8, 4, 2]
    assert [l.upsample for l in st16.decoder_levels] == [True, True, True, False]


@pytest.mark.parametrize("cfg,B", [(LEN64, 2), (LEN8, 3)])
def test_model_shapes(cfg, B):
    model = HMVAE(cfg)
    T = cfg.train_seq_len
    x = jnp.zeros((B, T, 24, 6))
    params = model.init(jax.random.PRNGKey(0), x)

    _, z_stats = model.apply(params, x, method=HMVAE.encode)
    st = get_structure(cfg)
    assert len(z_stats) == 4
    for i, zs in enumerate(z_stats):
        d = cfg.shallow_latent_d if i == 0 else cfg.latent_d
        assert zs.shape == (B, st.z_edges[i], 2 * d), (i, zs.shape)

    z_list = [split_stats(zs, cfg, i)[0] for i, zs in enumerate(z_stats)]
    out = model.apply(params, z_list, method=HMVAE.decode)
    assert out.shape == (B, T, 24, 6)


def test_middle_latents_are_ignored():
    """Decoder output must not depend on the two middle z vectors
    (seq_two_hier_sa_vae.py:278-288 consumes only deepest + shallowest)."""
    cfg = LEN8
    model = HMVAE(cfg)
    x = jnp.zeros((2, cfg.train_seq_len, 24, 6))
    params = model.init(jax.random.PRNGKey(0), x)
    z = prior_z_list(jax.random.PRNGKey(1), cfg, 2)
    out1 = model.apply(params, z, method=HMVAE.decode)
    z2 = list(z)
    z2[1] = z2[1] + 100.0
    z2[2] = z2[2] - 50.0
    out2 = model.apply(params, z2, method=HMVAE.decode)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
    # but deep and shallow latents do matter
    z3 = list(z)
    z3[3] = z3[3] + 1.0
    out3 = model.apply(params, z3, method=HMVAE.decode)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-3


def test_param_shapes_and_init_stats():
    cfg = LEN64
    model = HMVAE(cfg)
    x = jnp.zeros((1, 64, 24, 6))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    enc = params["encoder"]
    assert enc["conv_0"]["weight"].shape == (288, 144, 15)
    assert enc["conv_3"]["weight"].shape == (672, 336, 15)
    assert enc["latent_head_0"]["kernel"].shape == (12 * 32, 24)
    assert enc["latent_head_3"]["kernel"].shape == (96 * 4, 48)
    dec = params["decoder"]
    assert dec["latent_dec_0"]["kernel"].shape == (24, 96 * 4)
    assert dec["latent_dec_3"]["kernel"].shape == (12, 12 * 32)
    assert dec["conv_3"]["weight"].shape == (144, 576, 15)
    assert "bias" not in dec["conv_1"]

    # dense init: kaiming normal fan_in -> std ~ sqrt(2/fan_in), zero bias
    k = np.asarray(enc["latent_head_0"]["kernel"])
    assert abs(k.std() - np.sqrt(2.0 / k.shape[0])) < 0.15 * np.sqrt(2.0 / k.shape[0])
    np.testing.assert_allclose(np.asarray(enc["latent_head_0"]["bias"]), 0.0)

    # skeleton conv init: per-block uniform with bound 1/sqrt(fan_in_block)
    st = get_structure(cfg)
    w = np.asarray(enc["conv_0"]["weight"])
    bounds = np.repeat(st.encoder_levels[0].conv.block_bounds, 288 // 24)
    assert (np.abs(w) <= bounds[:, None, None] + 1e-7).all()
    # uniform(-b, b) has std b/sqrt(3)
    got = w.std(axis=(1, 2))
    want = bounds / np.sqrt(3)
    np.testing.assert_allclose(got, want, rtol=0.2)


def test_prior_z_layout():
    z = prior_z_list(jax.random.PRNGKey(0), LEN64, 5)
    assert [tuple(x.shape) for x in z] == [
        (5, 14, 12), (5, 9, 24), (5, 7, 24), (5, 7, 24)]
    assert np.asarray(z[1]).max() == 0.0 and np.asarray(z[2]).max() == 0.0
    assert np.asarray(z[0]).std() > 0.5 and np.asarray(z[3]).std() > 0.5


def test_bfloat16_compute_mode():
    """bf16 conv compute with f32 master params: same function to ~1e-2."""
    import dataclasses
    cfg32 = LEN8
    cfg16 = dataclasses.replace(LEN8, compute_dtype="bfloat16")
    m32, m16 = HMVAE(cfg32), HMVAE(cfg16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 24, 6)) * 0.5
    params = m32.init(jax.random.PRNGKey(0), x)
    # same params work in both modes (f32 master weights)
    _, z32 = m32.apply(params, x, method=HMVAE.encode)
    _, z16 = m16.apply(params, x, method=HMVAE.encode)
    for a, b in zip(z32, z16):
        assert b.dtype == jnp.float32  # latent stats stay f32
        scale = max(1.0, float(jnp.abs(a).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-2)
