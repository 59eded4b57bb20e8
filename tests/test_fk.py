"""FK tests: rest pose golden, numpy oracle, differentiability, 6D path."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from hm_vae_tpu.ops import fk as fk_mod
from hm_vae_tpu.ops import rotations as rot
from hm_vae_tpu.ops.topology import ASSETS_DIR, SMPL24_PARENTS


def numpy_fk_oracle(rotmats, offsets, parents):
    """Straightforward sequential-loop FK (the reference's algorithm,
    fk_layer.py:63-80) in numpy, used as ground truth."""
    B, J = rotmats.shape[:2]
    g_rot = np.zeros((B, J, 3, 3))
    pos = np.zeros((B, J, 3))
    g_rot[:, 0] = rotmats[:, 0]
    pos[:, 0] = offsets[0]
    for j in range(1, J):
        p = parents[j]
        g_rot[:, j] = g_rot[:, p] @ rotmats[:, j]
        pos[:, j] = pos[:, p] + np.einsum("bij,j->bi", g_rot[:, p], offsets[j])
    return pos


def test_identity_rotations_reproduce_rest_pose():
    offsets = fk_mod.default_offsets()
    rest = np.load(os.path.join(ASSETS_DIR, "rest_pose_coord.npy")).astype(np.float32)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (1, 24, 3, 3))
    pos = np.asarray(fk_mod.fk_from_rotmat(eye, offsets))[0]
    oracle = numpy_fk_oracle(np.asarray(eye), offsets, SMPL24_PARENTS)[0]
    np.testing.assert_allclose(pos, oracle, atol=1e-6)
    # rest_pose_coord asset should be the cumulative offsets (shifted by any
    # global convention); verify relative structure matches
    np.testing.assert_allclose(
        pos - pos[0:1], rest - rest[0:1], atol=1e-4
    )


def test_fk_matches_oracle_random():
    from scipy.spatial.transform import Rotation as R
    offsets = fk_mod.default_offsets()
    mats = R.random(5 * 24, random_state=0).as_matrix().reshape(5, 24, 3, 3)
    mats = mats.astype(np.float32)
    ours = np.asarray(fk_mod.fk_from_rotmat(jnp.asarray(mats), offsets))
    oracle = numpy_fk_oracle(mats, offsets, SMPL24_PARENTS)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_fk_from_rot6d_consistent():
    from scipy.spatial.transform import Rotation as R
    offsets = fk_mod.default_offsets()
    mats = R.random(3 * 24, random_state=1).as_matrix().reshape(3, 24, 3, 3)
    mats = mats.astype(np.float32)
    six = rot.rotmat_to_rot6d(jnp.asarray(mats))
    p1 = np.asarray(fk_mod.fk_from_rot6d(six, offsets))
    p2 = np.asarray(fk_mod.fk_from_rotmat(jnp.asarray(mats), offsets))
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_fk_arbitrary_leading_dims_and_jit():
    from scipy.spatial.transform import Rotation as R
    offsets = fk_mod.default_offsets()
    mats = R.random(2 * 7 * 24, random_state=2).as_matrix().reshape(2, 7, 24, 3, 3)
    mats = mats.astype(np.float32)
    f = jax.jit(lambda m: fk_mod.fk_from_rotmat(m, offsets))
    out = np.asarray(f(jnp.asarray(mats)))
    assert out.shape == (2, 7, 24, 3)
    flat = numpy_fk_oracle(mats.reshape(14, 24, 3, 3), offsets, SMPL24_PARENTS)
    np.testing.assert_allclose(out.reshape(14, 24, 3), flat, atol=1e-5)


def test_fk_differentiable():
    offsets = fk_mod.default_offsets()

    def loss(six):
        return jnp.sum(fk_mod.fk_from_rot6d(six, offsets) ** 2)

    rng = np.random.default_rng(3)
    six = jnp.asarray(rng.normal(size=(1, 24, 6)).astype(np.float32))
    g = jax.grad(loss)(six)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_level_schedule_depths():
    levels = fk_mod.level_schedule(SMPL24_PARENTS)
    covered = [j for joints, _ in levels for j in joints]
    assert sorted(covered) == list(range(1, 24))
    # SMPL tree depth (excluding root) is 7: e.g. 0-1-4-7-10 legs depth 4,
    # arm chain 0-3-6-9-13-16-18-20-22 depth 8 -> levels == 8
    assert len(levels) == 8


def test_fk_doubling_matches_level_schedule():
    from scipy.spatial.transform import Rotation as R
    offsets = fk_mod.default_offsets()
    mats = R.random(6 * 24, random_state=5).as_matrix().reshape(6, 24, 3, 3)
    mats = mats.astype(np.float32)
    p1 = np.asarray(fk_mod.fk_from_rotmat(jnp.asarray(mats), offsets))
    p2 = np.asarray(fk_mod.fk_doubling(jnp.asarray(mats), offsets))
    np.testing.assert_allclose(p2, p1, atol=1e-5)
    # global rotations too
    _, g1 = fk_mod.fk_from_rotmat(jnp.asarray(mats), offsets,
                                  return_global_rot=True)
    _, g2 = fk_mod.fk_doubling(jnp.asarray(mats), offsets,
                               return_global_rot=True)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), atol=1e-5)


def test_fk_doubling_gradients():
    offsets = fk_mod.default_offsets()

    def loss(six):
        return jnp.sum(fk_mod.fk_doubling(
            rot.rot6d_to_rotmat(six), offsets) ** 2)

    rng = np.random.default_rng(6)
    six = jnp.asarray(rng.normal(size=(2, 24, 6)).astype(np.float32))
    g = jax.grad(loss)(six)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
