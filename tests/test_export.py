"""Serving-export tests: StableHLO bundle round-trip, symbolic batch/time
dims, manifest contents (hm_vae_tpu/apps/export.py)."""

import pytest
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from hm_vae_tpu.apps.export import (
    MANIFEST_NAME, export_bundle, hmvae_export_functions, load_exported,
    trajectory_export_function,
)
from hm_vae_tpu.apps.inference import VAEInference
from hm_vae_tpu.data import layout
from hm_vae_tpu.models.hm_vae import HMVAE, prior_z_list
from hm_vae_tpu.models.trajectory import TrajectoryModel, TrajectoryRunner
from hm_vae_tpu.ops import rotations as rot
from hm_vae_tpu.utils.config import Config, LossConfig, ModelConfig

CFG = Config(model=ModelConfig(latent_d=6, shallow_latent_d=6, kernel_size=3,
                               train_seq_len=8))
TRAJ_CFG = Config(
    model=ModelConfig(model_name="TrajectoryModel", latent_d=12, kernel_size=7,
                      train_seq_len=32, trajectory_input_joint_pos=True),
    loss=LossConfig(rec_root_v_w=1.0, rec_root_trans_w=1.0),
)


def _vae():
    model = HMVAE(CFG.model)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 24, 6)))
    return model, params


def _rand6d(key, B, T):
    aa = jax.random.normal(key, (B, T, 24, 3)) * 0.3
    return rot.rotmat_to_rot6d(rot.aa_to_rotmat(aa))


def _mean_std():
    rng = np.random.default_rng(3)
    ms = np.zeros((2, layout.FRAME_DIM), np.float32)
    ms[0] = rng.normal(size=layout.FRAME_DIM) * 0.1
    ms[1] = 1.0 + 0.2 * rng.random(layout.FRAME_DIM)
    return ms


def test_bundle_round_trip_matches_direct_inference(tmp_path):
    model, params = _vae()
    out_dir = str(tmp_path / "bundle")
    manifest = export_bundle(out_dir, model, params, CFG)

    assert set(manifest["functions"]) == {"reconstruct", "encode_mean",
                                          "decode"}
    assert os.path.exists(os.path.join(out_dir, MANIFEST_NAME))
    # manifest is standalone-readable json with per-function metadata
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        on_disk = json.load(f)
    assert on_disk["functions"]["reconstruct"]["bytes"] > 0
    assert "cpu" in on_disk["platforms"]

    fns = load_exported(out_dir)
    infer = VAEInference(model, params, CFG)
    x = _rand6d(jax.random.PRNGKey(1), 2, 8)

    got6d, gotrot, gotpose = fns["reconstruct"].call(x)
    want6d, wantrot, wantpose = infer.mean_reconstruction(x)
    np.testing.assert_allclose(np.asarray(got6d), np.asarray(want6d),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gotpose), np.asarray(wantpose),
                               atol=1e-5)

    # encode_mean matches the posterior means
    zs = fns["encode_mean"].call(x)
    want_z = infer.mean_z(x)
    assert len(zs) == len(want_z)
    for g, w in zip(zs, want_z):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


@pytest.mark.slow
def test_symbolic_batch_serves_multiple_sizes(tmp_path):
    model, params = _vae()
    out_dir = str(tmp_path / "bundle")
    export_bundle(out_dir, model, params, CFG)
    fns = load_exported(out_dir)
    infer = VAEInference(model, params, CFG)
    for B in (1, 5):
        x = _rand6d(jax.random.PRNGKey(B), B, 8)
        got6d, _, _ = fns["reconstruct"].call(x)
        want6d, _, _ = infer.mean_reconstruction(x)
        assert got6d.shape == (B, 8, 24, 6)
        np.testing.assert_allclose(np.asarray(got6d), np.asarray(want6d),
                                   atol=1e-5)


def test_decode_serves_prior_samples(tmp_path):
    model, params = _vae()
    table = hmvae_export_functions(model, params, CFG)
    fn, specs = table["decode"]
    from jax import export as jexport
    exp = jexport.export(jax.jit(fn), platforms=["cpu"])(*specs)
    rt = jexport.deserialize(exp.serialize())

    # client-side prior sampling: N(0, I) z fed to the exported decoder
    zs = tuple(prior_z_list(jax.random.PRNGKey(7), CFG.model, 3))
    got6d, gotrot, gotpose = rt.call(zs)
    infer = VAEInference(model, params, CFG)
    want6d, _, wantpose = infer.decode_full(list(zs))
    np.testing.assert_allclose(np.asarray(got6d), np.asarray(want6d),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gotpose), np.asarray(wantpose),
                               atol=1e-5)


def test_trajectory_export_symbolic_time(tmp_path):
    t_model = TrajectoryModel(TRAJ_CFG.model)
    t_params = t_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24, 3)))
    ms = _mean_std()

    fn, specs = trajectory_export_function(t_model, t_params, ms, min_time=16)
    from jax import export as jexport
    exp = jexport.export(jax.jit(fn), platforms=["cpu"])(*specs)
    rt = jexport.deserialize(exp.serialize())

    runner = TrajectoryRunner(t_model, t_params, ms)
    rng = np.random.default_rng(1)
    for B, T in ((1, 32), (2, 100)):
        pose = jnp.asarray(rng.normal(size=(B, T, 24, 3)).astype(np.float32))
        got = rt.call(pose)
        want = runner._predict(pose)
        assert got.shape == (B, T, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


def test_full_bundle_with_trajectory(tmp_path):
    model, params = _vae()
    t_model = TrajectoryModel(TRAJ_CFG.model)
    t_params = t_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 24, 3)))
    out_dir = str(tmp_path / "bundle")
    manifest = export_bundle(out_dir, model, params, CFG,
                             trajectory=(t_model, t_params, _mean_std()))
    assert "trajectory" in manifest["functions"]
    fns = load_exported(out_dir)
    out = fns["trajectory"].call(jnp.zeros((2, 20, 24, 3)))
    assert out.shape == (2, 20, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_export_cli_end_to_end(tmp_path):
    import yaml

    cfg = {
        "model_name": "TwoHierSAVAEModel", "latent_d": 6, "shallow_latent_d": 6,
        "kernel_size": 3, "train_seq_len": 8,
    }
    cfg_path = str(tmp_path / "vae.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    tcfg = {
        "model_name": "TrajectoryModel", "latent_d": 12, "kernel_size": 7,
        "train_seq_len": 32, "trajectory_input_joint_pos": True,
        "rec_root_v_w": 1.0, "rec_root_trans_w": 1.0,
    }
    tcfg_path = str(tmp_path / "traj.yaml")
    with open(tcfg_path, "w") as f:
        yaml.safe_dump(tcfg, f)

    from hm_vae_tpu.cli.export_model import main

    out = str(tmp_path / "bundle")
    # cpu-only lowering keeps the test fast; fresh-init params (no ckpt)
    main(["--config", cfg_path, "--trajectory_config", tcfg_path,
          "--out", out, "--platforms", "cpu"])

    from hm_vae_tpu.apps.export import load_exported

    fns = load_exported(out)
    assert set(fns) == {"reconstruct", "encode_mean", "decode", "trajectory"}
    got6d, _, _ = fns["reconstruct"].call(jnp.zeros((2, 8, 24, 6)))
    assert got6d.shape == (2, 8, 24, 6)


@pytest.mark.slow
def test_bf16_serving_bundle_smaller_and_close(tmp_path):
    model, params = _vae()
    d32 = str(tmp_path / "f32")
    d16 = str(tmp_path / "bf16")
    m32 = export_bundle(d32, model, params, CFG, platforms=("cpu",))
    m16 = export_bundle(d16, model, params, CFG, platforms=("cpu",),
                        serve_dtype="bfloat16")
    assert m16["serve_dtype"] == "bfloat16"
    # bf16 weight constants shrink the artifact (params dominate its size)
    assert (m16["functions"]["reconstruct"]["bytes"]
            < 0.8 * m32["functions"]["reconstruct"]["bytes"])

    f32 = load_exported(d32)
    f16 = load_exported(d16)
    x = _rand6d(jax.random.PRNGKey(11), 2, 8)
    a6, _, ap = f32["reconstruct"].call(x)
    b6, _, bp = f16["reconstruct"].call(x)
    # bf16 has 8 mantissa bits: expect ~1e-2 relative deviation, not equality
    np.testing.assert_allclose(np.asarray(b6), np.asarray(a6),
                               atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(bp), np.asarray(ap),
                               atol=0.05, rtol=0.05)
    assert np.asarray(b6).dtype == np.float32  # outputs stay f32
