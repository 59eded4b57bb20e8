"""weights_init parity: the reference trainer's init dispatch on the latent
Dense heads (trainer_motion_vae.py:264-283, YAML key `init`,
configs/len64_no_aug_hm_vae.yaml:11).

The reference's weights_init matches module class names that *start with*
Conv/Linear, so only the plain latent nn.Linear heads are re-initialized;
SkeletonConv/SkeletonLinear keep their construction-time per-block init.
These tests check our dense_kernel_init reproduces each torch branch's
distribution analytically, checks the imported reference code against the
same analytic values (validating the reading of torch semantics), and that
SkeletonConv weights are independent of init_type.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_vae_tpu.models.hm_vae import HMVAE, dense_kernel_init
from hm_vae_tpu.utils.config import ModelConfig, from_flat_dict

CFG = ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3, train_seq_len=8)


def _head_kernels(init_type):
    model = HMVAE(CFG, init_type=init_type)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((2, 8, 24, 6)))["params"]
    ks = {}
    for scope in ("encoder", "decoder"):
        for name, leaf in params[scope].items():
            if name.startswith(("latent_head", "latent_dec")):
                ks[f"{scope}/{name}"] = np.asarray(leaf["kernel"])
                assert not np.any(np.asarray(leaf["bias"]))  # bias zeroed
    assert len(ks) == 8
    return ks, params


def _expected_std(init_type, fan_in, fan_out):
    if init_type == "gaussian":
        return 0.02
    if init_type == "xavier":
        return 2.0 / math.sqrt(fan_in + fan_out)
    if init_type == "kaiming":
        return math.sqrt(2.0 / fan_in)
    raise AssertionError(init_type)


@pytest.mark.parametrize("init_type", ["gaussian", "xavier", "kaiming"])
def test_dense_head_std_matches_torch_formula(init_type):
    ks, _ = _head_kernels(init_type)
    for name, k in ks.items():
        fan_in, fan_out = k.shape
        exp = _expected_std(init_type, fan_in, fan_out)
        assert abs(np.mean(k)) < 4 * exp / math.sqrt(k.size)
        assert np.std(k) == pytest.approx(exp, rel=0.15), name


def test_default_is_torch_linear_kaiming_uniform():
    # torch Linear default: kaiming_uniform(a=sqrt(5)) -> U(-b, b), b=1/sqrt(fan_in)
    ks, _ = _head_kernels("default")
    for name, k in ks.items():
        b = 1.0 / math.sqrt(k.shape[0])
        assert np.abs(k).max() <= b + 1e-7, name
        # uniform std = b/sqrt(3)
        assert np.std(k) == pytest.approx(b / math.sqrt(3), rel=0.15), name


def test_orthogonal_gain_sqrt2():
    ks, _ = _head_kernels("orthogonal")
    for name, k in ks.items():
        # semi-orthogonal scaled by sqrt(2): the smaller-side gram is 2*I
        g = k.T @ k if k.shape[0] >= k.shape[1] else k @ k.T
        np.testing.assert_allclose(g, 2.0 * np.eye(g.shape[0]),
                                   atol=1e-4, err_msg=name)


def test_skeleton_conv_independent_of_init_type():
    _, p_g = _head_kernels("gaussian")
    _, p_k = _head_kernels("kaiming")
    w_g = np.asarray(p_g["encoder"]["conv_0"]["weight"])
    w_k = np.asarray(p_k["encoder"]["conv_0"]["weight"])
    np.testing.assert_array_equal(w_g, w_k)


def test_unknown_init_rejected():
    with pytest.raises(ValueError, match="unsupported init"):
        dense_kernel_init("bogus")


def test_trainer_fails_fast_on_unknown_init(tmp_path):
    from hm_vae_tpu.train.trainer import Trainer
    from hm_vae_tpu.utils.config import (
        Config, DataConfig, OptimConfig,
    )

    cfg = Config(
        model=CFG,
        optim=OptimConfig(init="bogus", batch_size=4),
        data=DataConfig(data_root=str(tmp_path), synthetic=True),
    )
    with pytest.raises(ValueError, match="unsupported init"):
        Trainer(cfg, output_dir=str(tmp_path / "run"))


def test_flat_yaml_init_key_reaches_optim():
    cfg = from_flat_dict({"init": "gaussian"})
    assert cfg.optim.init == "gaussian"


@pytest.mark.parametrize("init_type", ["gaussian", "xavier", "kaiming"])
def test_reference_weights_init_matches_same_formula(init_type):
    """Run the ACTUAL reference weights_init and check its latent nn.Linear
    weights land on the same analytic std we implement against."""
    ref = pytest.importorskip("tests.ref_harness", reason="reference missing")
    ns = ref.load_reference()
    hp = ref.make_hp("len8_data_aug_hm_vae.yaml")
    model = ref.build_vae(hp)
    model.apply(ns.trainer_mod.weights_init(init_type))
    n_checked = 0
    for lin in list(model.enc.latent_enc_layers) + list(model.dec.latent_dec_layers):
        w = lin.weight.detach().numpy()
        fan_out, fan_in = w.shape  # torch layout
        exp = _expected_std(init_type, fan_in, fan_out)
        assert np.std(w) == pytest.approx(exp, rel=0.15)
        assert not np.any(lin.bias.detach().numpy())
        n_checked += 1
    assert n_checked == 8
