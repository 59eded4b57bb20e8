"""Latent-space exploration tests (apps/latent_space.py + its CLI) — the
reference's intended ``check_hier_latent_space`` / ``vis_given_z_vec``
surface (``trainer_motion_vae.py:151-152, 187-188``)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hm_vae_tpu.apps import latent_space as ls
from hm_vae_tpu.apps.inference import VAEInference
from hm_vae_tpu.models.hm_vae import HMVAE
from hm_vae_tpu.ops import rotations as rot
from hm_vae_tpu.utils.config import Config, ModelConfig

CFG = Config(model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                               train_seq_len=8))


def _setup():
    model = HMVAE(CFG.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 6)))
    return VAEInference(model, params, CFG)


def _rand6d(key, B, T):
    aa = jax.random.normal(key, (B, T, 24, 3)) * 0.3
    return rot.rotmat_to_rot6d(rot.aa_to_rotmat(aa))


def test_level_sweep_demonstrates_2_of_4_structure():
    """Sweeping a middle level decodes identically to the all-zero baseline
    (the decoder consumes only deep + shallow, seq_two_hier_sa_vae.py:278-288);
    sweeping a consumed level changes the output."""
    infer = _setup()
    out = ls.level_sweep(infer, jax.random.PRNGKey(1), batch=2)
    base = np.asarray(out["baseline"][2])
    nl = CFG.model.num_layers
    for lvl in range(1, nl - 1):
        np.testing.assert_allclose(np.asarray(out[f"level_{lvl}"][2]), base,
                                   atol=1e-6)
    for lvl in (0, nl - 1):
        assert np.abs(np.asarray(out[f"level_{lvl}"][2]) - base).max() > 1e-4

    for v in out.values():  # (rot6d, rotmat, pose) shapes
        assert v[0].shape == (2, 8, 24, 6)
        assert v[2].shape == (2, 8, 24, 3)


def test_level_swap_swaps_only_that_level():
    """Swapping the deep level from B then the shallow level from B must
    reproduce B's full mean reconstruction (those are the only two consumed
    levels)."""
    infer = _setup()
    a6 = _rand6d(jax.random.PRNGKey(2), 1, 8)
    b6 = _rand6d(jax.random.PRNGKey(3), 1, 8)
    nl = CFG.model.num_layers

    za, zb = infer.mean_z(a6), infer.mean_z(b6)
    zs = list(za)
    zs[0], zs[nl - 1] = zb[0], zb[nl - 1]
    both_swapped = np.asarray(infer.decode_full(zs)[0])
    b_rec = np.asarray(infer.mean_reconstruction(b6)[0])
    np.testing.assert_allclose(both_swapped, b_rec, atol=1e-5)

    # a single-level swap differs from both endpoints
    one = np.asarray(ls.level_swap(infer, a6, b6, nl - 1)[0])
    a_rec = np.asarray(infer.mean_reconstruction(a6)[0])
    assert np.abs(one - a_rec).max() > 1e-4
    assert np.abs(one - b_rec).max() > 1e-4


def test_latent_lerp_endpoints_are_mean_reconstructions():
    infer = _setup()
    a6 = _rand6d(jax.random.PRNGKey(4), 1, 8)
    b6 = _rand6d(jax.random.PRNGKey(5), 1, 8)
    outs = ls.latent_lerp(infer, a6, b6, num=3)
    a_rec = np.asarray(infer.mean_reconstruction(a6)[0])
    b_rec = np.asarray(infer.mean_reconstruction(b6)[0])
    np.testing.assert_allclose(np.asarray(outs[0][0]), a_rec, atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[-1][0]), b_rec, atol=1e-6)
    assert len(outs) == 3


def test_decode_given_z_validates_shapes():
    infer = _setup()
    zs = ls.prior_z_list(jax.random.PRNGKey(6), CFG.model, 2)
    out6d, _, pose = ls.decode_given_z(infer, [np.asarray(z) for z in zs])
    assert out6d.shape == (2, 8, 24, 6)
    assert np.isfinite(np.asarray(pose)).all()
    with pytest.raises(ValueError):
        ls.decode_given_z(infer, [np.zeros((2, 3, 4))])


def test_explore_latent_cli(tmp_path):
    import yaml

    data_root = str(tmp_path / "data")
    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8, "batch_size": 4,
        "synthetic": True, "synthetic_num_seqs": 6, "data_root": data_root,
    }
    cfg_path = str(tmp_path / "lat.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    # a saved z-list to decode via --vis_given_z_vec
    zs = ls.prior_z_list(jax.random.PRNGKey(7), CFG.model, 1)
    z_path = str(tmp_path / "z.npz")
    np.savez(z_path, **{f"z{i}": np.asarray(z) for i, z in enumerate(zs)})

    from hm_vae_tpu.cli.explore_latent import main

    main(["--config", cfg_path, "--output_path", str(tmp_path),
          "--check_hier_latent_space", "--vis_given_z_vec", z_path,
          "--num_samples", "2", "--num_lerp", "3"])

    out_dir = tmp_path / "latent_space" / "lat"
    with open(out_dir / "index.json") as f:
        index = json.load(f)
    expected = {"given_z", "sweep_baseline", "sweep_level_0", "sweep_level_3",
                "swap_shallow_from_b", "swap_deep_from_b", "lerp_0", "lerp_2"}
    assert expected <= set(index)
    for name in expected:
        arr = np.load(os.path.join(out_dir, f"{name}_pose.npy"))
        assert arr.shape[-2:] == (24, 3) and np.isfinite(arr).all()
