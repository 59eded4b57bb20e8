"""Checkpoint import/export round-trip and constant validation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hm_vae_tpu.models.hm_vae import HMVAE
from hm_vae_tpu.models.trajectory import TrajectoryModel
from hm_vae_tpu.utils.config import ModelConfig
from hm_vae_tpu.utils.torch_import import (
    export_hmvae_params, import_hmvae_params, import_trajectory_params,
)

CFG = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3, train_seq_len=8)


def test_hmvae_roundtrip():
    model = HMVAE(CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 24, 6)) * 0.5
    variables = model.init(jax.random.PRNGKey(0), x)

    sd = export_hmvae_params(jax.tree.map(np.asarray, variables), CFG)
    # reference-style names present
    assert "enc.layers.0.0.weight" in sd
    assert "enc.latent_enc_layers.3.bias" in sd
    assert "dec.latent_dec_layers.0.weight" in sd

    back = import_hmvae_params(sd, CFG)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    # imported tree actually runs and matches the original forward
    _, z1 = model.apply(variables, x, method=HMVAE.encode)
    _, z2 = model.apply(back, x, method=HMVAE.encode)
    np.testing.assert_allclose(np.asarray(z1[0]), np.asarray(z2[0]), atol=1e-6)


def test_constant_mismatch_fails_loudly():
    model = HMVAE(CFG)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 6)))
    sd = export_hmvae_params(jax.tree.map(np.asarray, variables), CFG)
    sd["enc.layers.0.1.weight"] = sd["enc.layers.0.1.weight"] + 1.0
    with pytest.raises(ValueError, match="wrong architecture"):
        import_hmvae_params(sd, CFG)


def test_trajectory_import():
    cfg = ModelConfig(model_name="TrajectoryModel", latent_d=12, kernel_size=3,
                      train_seq_len=8, trajectory_input_joint_pos=True)
    model = TrajectoryModel(cfg)
    x = jnp.zeros((1, 8, 24, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(np.asarray, variables)["params"]
    # build a reference-style dict from our params
    sd = {}
    for i in range(4):
        sd[f"enc.layers.{i}.0.weight"] = params["encoder"][f"conv_{i}"]["weight"]
        sd[f"enc.layers.{i}.0.bias"] = params["encoder"][f"conv_{i}"]["bias"]
    sd["fc_mapping.weight"] = params["fc_mapping"]["kernel"].T
    sd["fc_mapping.bias"] = params["fc_mapping"]["bias"]
    back = import_trajectory_params(sd, cfg)
    r = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 24, 3))
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, r)),
        np.asarray(model.apply(back, r)), atol=1e-6)
