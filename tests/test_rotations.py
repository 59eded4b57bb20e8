"""Rotation transform tests: round-trips, orthonormality, torch cross-check.

Mirrors the reference's manual smoke check (``my_tools.py:83-97``) but as real
assertions, including an oracle comparison against scipy and (if available)
the exact torch formulas.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from hm_vae_tpu.ops import rotations as rot


def random_rotmats(n, seed=0):
    return R.random(n, random_state=seed).as_matrix().astype(np.float32)


def test_rot6d_roundtrip():
    mats = random_rotmats(64)
    six = rot.rotmat_to_rot6d(jnp.asarray(mats))
    back = rot.rot6d_to_rotmat(six)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)


def test_rot6d_to_rotmat_orthonormal_from_noise():
    rng = np.random.default_rng(1)
    six = jnp.asarray(rng.normal(size=(32, 6)).astype(np.float32))
    m = np.asarray(rot.rot6d_to_rotmat(six))
    eye = np.einsum("bij,bkj->bik", m, m)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), np.ones(32), atol=1e-5)
    # first column is the normalised first 3 numbers (reference convention)
    x = np.array(six)[:, :3]
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(m[:, :, 0], x, atol=1e-5)


def test_aa_to_rotmat_vs_scipy():
    rng = np.random.default_rng(2)
    aa = rng.normal(size=(128, 3)).astype(np.float32)
    ours = np.asarray(rot.aa_to_rotmat(jnp.asarray(aa)))
    scipy_m = R.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, scipy_m, atol=1e-5)


def test_aa_to_rotmat_small_angles():
    aa = jnp.asarray(np.array([[0, 0, 0], [1e-6, 0, 0], [0, -1e-7, 1e-7]],
                              dtype=np.float32))
    m = np.asarray(rot.aa_to_rotmat(aa))
    np.testing.assert_allclose(m[0], np.eye(3), atol=1e-6)
    scipy_m = R.from_rotvec(np.asarray(aa)).as_matrix()
    np.testing.assert_allclose(m, scipy_m, atol=1e-6)


def test_rotmat_to_aa_roundtrip():
    rng = np.random.default_rng(3)
    aa = rng.normal(size=(64, 3)).astype(np.float32) * 0.9
    m = rot.aa_to_rotmat(jnp.asarray(aa))
    back = np.asarray(rot.rotmat_to_aa(m))
    np.testing.assert_allclose(back, aa, atol=1e-3)


def test_vibe_6d_roundtrip():
    mats = random_rotmats(16, seed=4)
    six = rot.rotmat_to_rot6d(jnp.asarray(mats))
    vibe = rot.rot6d_ours_to_vibe(six)
    back = rot.rot6d_vibe_to_ours(vibe)
    np.testing.assert_allclose(np.asarray(back), np.asarray(six))
    # VIBE layout: reshape(-1, 3, 2) puts col0 in [:, :, 0]
    v = np.asarray(vibe).reshape(16, 3, 2)
    np.testing.assert_allclose(v[:, :, 0], mats[:, :, 0], atol=1e-6)


def test_matches_torch_formulas():
    torch = __import__("pytest").importorskip("torch")
    torch_F = torch.nn.functional
    rng = np.random.default_rng(5)
    six = rng.normal(size=(20, 6)).astype(np.float32)

    # torch re-derivation of the reference rotation_matrix_from_ortho6d
    t = torch.from_numpy(six)
    x = torch_F.normalize(t[:, 0:3], dim=-1, eps=1e-6)
    z = torch_F.normalize(torch.cross(x, t[:, 3:6], dim=-1), dim=-1, eps=1e-6)
    y = torch.cross(z, x, dim=-1)
    ref = torch.stack((x, y, z), dim=-1).numpy()

    ours = np.asarray(rot.rot6d_to_rotmat(jnp.asarray(six)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rot6d_spin_convention():
    """SPIN layout roundtrip: our 6D converted to VIBE layout must decode to
    the same matrix through the SPIN converter."""
    mats = random_rotmats(10, seed=7)
    six = rot.rotmat_to_rot6d(jnp.asarray(mats))
    vibe = rot.rot6d_ours_to_vibe(six)
    back = rot.rot6d_to_rotmat_spin(vibe)
    np.testing.assert_allclose(np.asarray(back), mats, atol=1e-5)
