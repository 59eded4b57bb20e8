"""SMPL LBS adapter tests with a tiny synthetic body model.

The licensed SMPL files aren't vendored; these tests build a small fake body
model npz with the same array layout and check the LBS math invariants the
real model relies on (utils_common.py:592-690 export parity).
"""

import os

import numpy as np
import pytest

from hm_vae_tpu.utils.smpl import SMPLBodyModel, export_mesh_sequence, write_obj

J, V, NB = 24, 40, 10
PARENTS = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
           18, 19, 20, 21]


def _tiny_model(tmp_path, with_posedirs=True):
    rng = np.random.default_rng(0)
    v_template = rng.standard_normal((V, 3)) * 0.1
    shapedirs = rng.standard_normal((V, 3, NB)) * 0.01
    posedirs = (rng.standard_normal((V, 3, 9 * (J - 1))) * 0.001
                if with_posedirs else np.zeros((V, 3, 9 * (J - 1))))
    # one dominant joint per vertex + slight spread, rows sum to 1
    W = rng.random((V, J)) * 0.05
    W[np.arange(V), rng.integers(0, J, V)] += 1.0
    W /= W.sum(axis=1, keepdims=True)
    Jreg = rng.random((J, V))
    Jreg /= Jreg.sum(axis=1, keepdims=True)
    kintree = np.stack([np.asarray(PARENTS), np.arange(J)])
    kintree[0, 0] = 2**32 - 1  # the official files store root parent as uint32 -1
    faces = rng.integers(0, V, (30, 3))
    path = os.path.join(tmp_path, "tiny_smpl.npz")
    np.savez(path, v_template=v_template, shapedirs=shapedirs,
             posedirs=posedirs, J_regressor=Jreg, weights=W,
             kintree_table=kintree.astype(np.uint32), f=faces)
    return path


def test_identity_pose_reproduces_template(tmp_path):
    model = SMPLBodyModel(_tiny_model(tmp_path))
    eye = np.broadcast_to(np.eye(3), (2, J, 3, 3))
    verts = model.forward(eye)
    # identity rotations, zero betas: LBS must return the template exactly
    np.testing.assert_allclose(verts, np.broadcast_to(
        model.v_template, (2, V, 3)), atol=1e-5)
    # translation is additive
    tr = np.asarray([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]])
    verts_t = model.forward(eye, transl=tr)
    np.testing.assert_allclose(
        verts_t - verts, np.broadcast_to(tr[:, None, :], (2, V, 3)), atol=1e-5)


def test_global_rotation_rotates_rigidly(tmp_path):
    """Rotating only the root applies a rigid rotation about the root joint."""
    model = SMPLBodyModel(_tiny_model(tmp_path, with_posedirs=False))
    from scipy.spatial.transform import Rotation as R

    Rg = R.random(1, random_state=3).as_matrix()[0]
    rots = np.broadcast_to(np.eye(3), (1, J, 3, 3)).copy()
    rots[0, 0] = Rg
    verts = model.forward(rots)[0]
    base = model.forward(np.broadcast_to(np.eye(3), (1, J, 3, 3)))[0]
    root = model.joints_of()[0]
    np.testing.assert_allclose(
        verts, (base - root) @ Rg.T + root, atol=1e-4)


def test_betas_shift_template(tmp_path):
    model = SMPLBodyModel(_tiny_model(tmp_path))
    betas = np.linspace(-1, 1, NB)
    eye = np.broadcast_to(np.eye(3), (1, J, 3, 3))
    verts = model.forward(eye, betas=betas)[0]
    np.testing.assert_allclose(
        verts, model.v_template + model.shapedirs @ betas, atol=1e-5)


def test_export_mesh_sequence_layout(tmp_path):
    """Folder layout parity with the reference exporter
    (our_wo_root_objs/%05d.obj, k_objs, mask/temporal_mask.npy)."""
    model = SMPLBodyModel(_tiny_model(tmp_path))
    T = 3
    rots = np.broadcast_to(np.eye(3), (T, J, 3, 3))
    trans = np.zeros((T, 3))
    mask = np.asarray([1, 0, 1])
    out = os.path.join(tmp_path, "meshes")
    export_mesh_sequence(out, rots, trans, model, temporal_mask=mask)
    assert sorted(os.listdir(os.path.join(out, "our_wo_root_objs"))) == [
        "00000.obj", "00001.obj", "00002.obj"]
    assert sorted(os.listdir(os.path.join(out, "k_objs"))) == [
        "00000_k.obj", "00002_k.obj"]
    saved = np.load(os.path.join(out, "mask", "temporal_mask.npy"))
    np.testing.assert_array_equal(saved, mask)
    with open(os.path.join(out, "our_wo_root_objs", "00000.obj")) as f:
        lines = f.read().strip().splitlines()
    assert sum(ln.startswith("v ") for ln in lines) == V
    assert sum(ln.startswith("f ") for ln in lines) == len(model.faces)


def test_save_mesh_obj_entrypoint(tmp_path, monkeypatch):
    from hm_vae_tpu.utils.viz import save_mesh_obj

    with pytest.raises(NotImplementedError):
        save_mesh_obj(str(tmp_path), np.zeros((1, J, 3, 3)), None)
    monkeypatch.setenv("HM_VAE_SMPL_MODEL", _tiny_model(tmp_path))
    rots = np.broadcast_to(np.eye(3), (1, J, 3, 3))
    out = save_mesh_obj(str(tmp_path / "m"), rots, np.zeros((1, 3)))
    assert os.path.exists(os.path.join(out, "00000.obj"))


def test_vertex_error_metric(tmp_path):
    """compute_error_verts analogue: zero for identical poses, |t| for a
    pure root translation, positive for a real pose difference."""
    from hm_vae_tpu.apps.metrics import vertex_error_from_rotmats

    model = SMPLBodyModel(_tiny_model(tmp_path, with_posedirs=False))
    eye = np.broadcast_to(np.eye(3), (3, J, 3, 3))
    assert vertex_error_from_rotmats(model, eye, eye) == pytest.approx(0.0)
    tr = np.tile(np.asarray([[0.3, 0.0, 0.4]]), (3, 1))
    assert vertex_error_from_rotmats(
        model, eye, eye, pred_transl=tr) == pytest.approx(0.5, abs=1e-5)
    from scipy.spatial.transform import Rotation as R

    posed = eye.copy()
    posed[:, 5] = R.from_rotvec([0.4, 0.2, 0.1]).as_matrix()
    assert vertex_error_from_rotmats(model, posed, eye) > 0.0
