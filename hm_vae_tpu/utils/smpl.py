"""Minimal SMPL body model (numpy LBS) for mesh export.

The reference's ``save_mesh_obj`` (``utils_common.py:592-690``) drives VIBE's
SMPL wrapper around the licensed SMPL body model to turn predicted rotation
matrices + root translation into per-frame ``.obj`` meshes.  The model files
are licensed and not vendored; this module implements the standard SMPL
linear-blend-skinning forward pass from scratch so a **user-provided** SMPL
npz/pkl (e.g. ``SMPL_NEUTRAL.pkl`` converted to npz) plugs straight in.

Required arrays in the npz (standard SMPL layout, names as in the official
release):
  v_template    (V, 3)        template vertices
  shapedirs     (V, 3, n_b)   shape blendshapes
  posedirs      (V, 3, 9*(J-1)) pose-corrective blendshapes (optional)
  J_regressor   (J, V)        joint regressor
  weights       (V, J)        skinning weights
  kintree_table (2, J) or parents (J,)  kinematic tree
  f / faces     (F, 3)        triangle faces
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class SMPLBodyModel:
    """Loads a user-provided SMPL npz and exposes an LBS forward pass."""

    def __init__(self, model_path: str):
        blob = np.load(model_path, allow_pickle=True)
        get = lambda *names: next(
            (np.asarray(blob[n], np.float64) for n in names if n in blob), None)
        self.v_template = get("v_template")
        self.shapedirs = get("shapedirs")
        self.posedirs = get("posedirs")
        self.J_regressor = get("J_regressor")
        self.weights = get("weights")
        faces = next((np.asarray(blob[n]) for n in ("f", "faces")
                      if n in blob), None)
        if any(x is None for x in (self.v_template, self.shapedirs,
                                   self.J_regressor, self.weights)) \
                or faces is None:
            raise ValueError(
                f"{model_path} is missing required SMPL arrays "
                "(v_template/shapedirs/J_regressor/weights/f)")
        self.faces = faces.astype(np.int64)
        if "parents" in blob:
            self.parents = np.asarray(blob["parents"], np.int64)
        else:
            kt = np.asarray(blob["kintree_table"], np.int64)
            self.parents = kt[0].copy()
        self.parents[0] = -1
        self.n_joints = self.J_regressor.shape[0]
        self.n_verts = self.v_template.shape[0]

    # ------------------------------------------------------------------
    def forward(self, rotmats: np.ndarray, transl: Optional[np.ndarray] = None,
                betas: Optional[np.ndarray] = None) -> np.ndarray:
        """LBS forward: (T, J, 3, 3) rotmats [+ (T, 3) transl, (n_b,) betas]
        -> (T, V, 3) vertices.  Matches the SMPL paper / smplx semantics
        (``pose2rot=False`` path of the reference's wrapper)."""
        rotmats = np.asarray(rotmats, np.float64)
        T = rotmats.shape[0]
        J = self.n_joints
        if betas is None:
            betas = np.zeros(self.shapedirs.shape[-1])
        betas = np.asarray(betas, np.float64)

        v_shaped = self.v_template + self.shapedirs @ betas        # (V, 3)
        joints = self.J_regressor @ v_shaped                        # (J, 3)

        v_posed = np.broadcast_to(v_shaped, (T,) + v_shaped.shape).copy()
        if self.posedirs is not None and self.posedirs.size:
            eye = np.eye(3)
            pose_feat = (rotmats[:, 1:] - eye).reshape(T, -1)       # (T, 9(J-1))
            v_posed += np.einsum("vdp,tp->tvd", self.posedirs, pose_feat)

        # forward kinematics over the kin tree
        G = np.zeros((T, J, 4, 4))
        G[:, 0, :3, :3] = rotmats[:, 0]
        G[:, 0, :3, 3] = joints[0]
        G[:, 0, 3, 3] = 1.0
        for j in range(1, J):
            p = self.parents[j]
            local = np.zeros((T, 4, 4))
            local[:, :3, :3] = rotmats[:, j]
            local[:, :3, 3] = joints[j] - joints[p]
            local[:, 3, 3] = 1.0
            G[:, j] = G[:, p] @ local

        # remove the rest-pose joint location (G_k' = G_k - pack(G_k j_k))
        rest = np.concatenate([joints, np.zeros((J, 1))], axis=1)   # (J, 4)
        correction = np.einsum("tjab,jb->tja", G, rest)             # (T, J, 4)
        Gc = G.copy()
        Gc[:, :, :, 3] -= correction

        # skinning
        Tmat = np.einsum("vj,tjab->tvab", self.weights, Gc)         # (T, V, 4, 4)
        hom = np.concatenate(
            [v_posed, np.ones((T, self.n_verts, 1))], axis=-1)
        verts = np.einsum("tvab,tvb->tva", Tmat, hom)[..., :3]
        if transl is not None:
            verts = verts + np.asarray(transl, np.float64)[:, None, :]
        return verts.astype(np.float32)

    # ------------------------------------------------------------------
    def joints_of(self, betas: Optional[np.ndarray] = None) -> np.ndarray:
        betas = (np.zeros(self.shapedirs.shape[-1]) if betas is None
                 else np.asarray(betas, np.float64))
        return (self.J_regressor @ (self.v_template
                                    + self.shapedirs @ betas)).astype(np.float32)


def write_obj(vertices: np.ndarray, faces: np.ndarray, path: str) -> None:
    """Plain .obj writer (write_obj_file, utils_common.py:582-590)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for fc in faces:
            f.write(f"f {fc[0] + 1} {fc[1] + 1} {fc[2] + 1}\n")


def export_mesh_sequence(out_folder: str, rot_mat: np.ndarray,
                         root_trans: Optional[np.ndarray],
                         model: SMPLBodyModel,
                         temporal_mask: Optional[np.ndarray] = None,
                         betas: Optional[np.ndarray] = None) -> str:
    """Per-frame SMPL .obj export with the reference's folder layout
    (``utils_common.py:592-690``): ``our_wo_root_objs/%05d.obj`` for every
    frame, ``k_objs/%05d_k.obj`` for mask==1 keyframes, and the temporal mask
    npy under ``mask/``."""
    rot_mat = np.asarray(rot_mat)
    T = rot_mat.shape[0]
    verts = model.forward(rot_mat, transl=root_trans, betas=betas)

    obj_dir = os.path.join(out_folder, "our_wo_root_objs")
    os.makedirs(obj_dir, exist_ok=True)
    k_dir = os.path.join(out_folder, "k_objs")
    if temporal_mask is not None:
        os.makedirs(k_dir, exist_ok=True)
    for t in range(T):
        write_obj(verts[t], model.faces,
                  os.path.join(obj_dir, f"{t:05d}.obj"))
        if temporal_mask is not None and temporal_mask[t] == 1:
            write_obj(verts[t], model.faces,
                      os.path.join(k_dir, f"{t:05d}_k.obj"))
    if temporal_mask is not None:
        mask_dir = os.path.join(out_folder, "mask")
        os.makedirs(mask_dir, exist_ok=True)
        np.save(os.path.join(mask_dir, "temporal_mask.npy"),
                np.asarray(temporal_mask))
    return obj_dir
