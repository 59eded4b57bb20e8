"""Inference utility tests: mean rec, prior samples, sliding refinement,
root-rot adjustment, aa ingestion."""

import numpy as np
import jax
import jax.numpy as jnp

from hm_vae_tpu.apps.inference import (
    VAEInference, adjust_root_rot, apply_root_rot_to_translation,
    aa_to_all_reps,
)
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


def test_mean_reconstruction_shapes():
    infer = _setup()
    x = _rand6d(jax.random.PRNGKey(1), 2, 8)
    out6d, outrot, outpose = infer.mean_reconstruction(x)
    assert out6d.shape == (2, 8, 24, 6)
    assert outrot.shape == (2, 8, 24, 3, 3)
    assert outpose.shape == (2, 8, 24, 3)


def test_prior_samples_and_clean6d():
    infer = _setup()
    out6d, outrot, _ = infer.prior_samples(jax.random.PRNGKey(2), 3)
    assert out6d.shape == (3, 8, 24, 6)
    clean = infer.clean_6d(out6d)
    # clean 6D reconstructs the same rotation matrices
    np.testing.assert_allclose(
        np.asarray(rot.rot6d_to_rotmat(clean)), np.asarray(outrot), atol=1e-5)
    # and is orthonormal (columns unit + orthogonal)
    c = np.asarray(clean).reshape(-1, 2, 3)
    np.testing.assert_allclose(np.linalg.norm(c, axis=-1), 1.0, atol=1e-5)


def test_sliding_window_refinement_length():
    infer = _setup()
    x = _rand6d(jax.random.PRNGKey(3), 1, 20)[0]  # (T, 24, 6)
    out = infer.refine_sliding_window(x)
    assert out.shape == (20, 24, 6)
    assert np.isfinite(np.asarray(out)).all()


def test_adjust_root_rot():
    key = jax.random.PRNGKey(4)
    mats = rot.aa_to_rotmat(jax.random.normal(key, (2, 5, 24, 3)) * 0.4)
    adj, rel = adjust_root_rot(mats)
    # first frame root is identity
    np.testing.assert_allclose(
        np.asarray(adj[:, 0, 0]), np.broadcast_to(np.eye(3), (2, 3, 3)),
        atol=1e-5)
    # non-root joints unchanged
    np.testing.assert_allclose(np.asarray(adj[:, :, 1:]),
                               np.asarray(mats[:, :, 1:]), atol=1e-6)
    # translation rotation is consistent shape-wise
    v = apply_root_rot_to_translation(rel, jnp.ones((2, 5, 3)))
    assert v.shape == (2, 5, 3)


def test_aa_to_all_reps():
    aa = np.random.default_rng(0).normal(size=(1, 6, 72)).astype(np.float32) * 0.3
    six, mats, pose = aa_to_all_reps(jnp.asarray(aa))
    assert six.shape == (1, 6, 24, 6)
    assert mats.shape == (1, 6, 24, 3, 3)
    assert pose.shape == (1, 6, 24, 3)
    from scipy.spatial.transform import Rotation as R
    ref = R.from_rotvec(aa.reshape(-1, 3)).as_matrix().reshape(1, 6, 24, 3, 3)
    np.testing.assert_allclose(np.asarray(mats), ref, atol=1e-5)
