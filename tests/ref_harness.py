"""Load and run the ACTUAL reference PyTorch code (/root/reference) on CPU.

Round-1 parity evidence was a hand-built torch oracle (test_torch_oracle.py);
this harness removes the shared-misreading risk by importing the reference's
own modules (``seq_two_hier_sa_vae.py``, ``trajectory_pred_model.py``) and
executing them, CPU-shimmed:

- ``torch.Tensor.cuda`` / ``torch.nn.Module.cuda`` become identity (the
  reference sprinkles ``.cuda()`` through model code,
  ``seq_two_hier_sa_vae.py:339-346`` etc.);
- ``torchgeometry`` (only ``angle_axis_to_rotation_matrix`` is used, for
  axis-angle ingestion) and ``torchvision`` / VIBE's ``lib.utils.eval_utils``
  (imported at module top, never exercised here) are stubbed;
- ``ForwardKinematicsLayer``'s hard-coded absolute asset paths
  (``fk_layer.py:18-19``) are redirected to the reference's own
  ``utils/data`` assets with a CPU device;
- model construction happens with cwd set to a scratch dir whose ``utils``
  symlinks the reference's, satisfying the relative asset paths at
  ``seq_two_hier_sa_vae.py:307, 319``.

Nothing from the reference is copied — the modules are imported from
/root/reference and executed as-is.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import tempfile
import types

import numpy as np

os.environ.setdefault("MPLBACKEND", "Agg")

REF_DIR = "/root/reference"

_cache: dict = {}


def _stub_torchgeometry(torch):
    """Minimal ``torchgeometry`` with the one function the reference uses.

    ``tgm.angle_axis_to_rotation_matrix(aa)``: (N,3) axis-angle -> (N,4,4)
    homogeneous rotation matrices (Rodrigues), matching torchgeometry's
    output convention (used by ``seq_two_hier_sa_vae.py:644-675``).
    """
    tgm = types.ModuleType("torchgeometry")

    def angle_axis_to_rotation_matrix(angle_axis):
        aa = angle_axis
        n = aa.shape[0]
        theta = torch.linalg.norm(aa, dim=1, keepdim=True)  # (N,1)
        safe = torch.clamp(theta, min=1e-12)
        axis = aa / safe
        x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
        zero = torch.zeros_like(x)
        K = torch.stack(
            [zero, -z, y, z, zero, -x, -y, x, zero], dim=1
        ).reshape(n, 3, 3)
        s = torch.sin(theta)[:, :, None]
        c = torch.cos(theta)[:, :, None]
        eye = torch.eye(3, dtype=aa.dtype).expand(n, 3, 3)
        R = eye + s * K + (1 - c) * (K @ K)
        # tiny angles: R -> I + K(aa) (first order), avoids 0/0 axis
        small = (theta < 1e-6).reshape(n, 1, 1)
        K_raw = torch.stack(
            [zero, -aa[:, 2], aa[:, 1], aa[:, 2], zero, -aa[:, 0],
             -aa[:, 1], aa[:, 0], zero], dim=1).reshape(n, 3, 3)
        R = torch.where(small, eye + K_raw, R)
        out = torch.zeros(n, 4, 4, dtype=aa.dtype)
        out[:, :3, :3] = R
        out[:, 3, 3] = 1.0
        return out

    tgm.angle_axis_to_rotation_matrix = angle_axis_to_rotation_matrix
    return tgm


def _stub_module(name, attrs=()):
    m = types.ModuleType(name)
    for a in attrs:
        def _unavailable(*_a, _name=f"{name}.{a}", **_k):
            raise NotImplementedError(f"{_name} is a test stub")
        setattr(m, a, _unavailable)
    return m


def load_reference():
    """Import the reference modules (memoized); returns a namespace object."""
    if "ns" in _cache:
        return _cache["ns"]

    import torch

    # identity .cuda() shims — this torch build is CPU-only
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    sys.modules.setdefault("torchgeometry", _stub_torchgeometry(torch))
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = _stub_module("torchvision.transforms")
        tv.utils = _stub_module("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils
    if "lib.utils.eval_utils" not in sys.modules:
        lib = types.ModuleType("lib")
        lib_utils = types.ModuleType("lib.utils")
        ev = _stub_module(
            "lib.utils.eval_utils",
            ("compute_accel", "compute_error_accel", "compute_error_verts",
             "batch_compute_similarity_transform_torch"))
        lib.utils = lib_utils
        lib_utils.eval_utils = ev
        sys.modules["lib"] = lib
        sys.modules["lib.utils"] = lib_utils
        sys.modules["lib.utils.eval_utils"] = ev

    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)

    import fk_layer  # noqa: E402  (reference module)

    _orig_fk_init = fk_layer.ForwardKinematicsLayer.__init__

    def _fk_init(self, device=None, parents=None, positions=None):
        if device is None or getattr(device, "type", "cpu") == "cuda":
            device = torch.device("cpu")
        if parents is None and positions is None:
            with open(os.path.join(REF_DIR, "utils/data/joint24_parents.json")) as f:
                parents = json.load(f)
            positions = np.load(
                os.path.join(REF_DIR, "utils/data/skeleton_offsets.npy"))
        _orig_fk_init(self, device=device, parents=parents,
                      positions=positions)

    fk_layer.ForwardKinematicsLayer.__init__ = _fk_init

    import my_tools  # noqa: E402
    import skeleton  # noqa: E402
    import seq_two_hier_sa_vae  # noqa: E402
    import trajectory_pred_model  # noqa: E402
    import trainer_motion_vae  # noqa: E402

    workdir = tempfile.mkdtemp(prefix="hmvae_ref_")
    os.symlink(os.path.join(REF_DIR, "utils"),
               os.path.join(workdir, "utils"))

    ns = types.SimpleNamespace(
        torch=torch,
        fk_layer=fk_layer,
        my_tools=my_tools,
        skeleton=skeleton,
        seq=seq_two_hier_sa_vae,
        traj=trajectory_pred_model,
        trainer_mod=trainer_motion_vae,
        workdir=workdir,
    )
    _cache["ns"] = ns
    return ns


@contextlib.contextmanager
def pushd(path):
    prev = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(prev)


def make_hp(config_name: str, **overrides):
    """Load a reference YAML config into the raw hp dict the models expect."""
    import yaml

    with open(os.path.join(REF_DIR, "configs", config_name)) as f:
        hp = yaml.safe_load(f)
    hp.update(overrides)
    return hp


def build_vae(hp):
    """Construct the reference TwoHierSAVAEModel (relative asset paths need
    cwd = a dir containing the reference's utils/ tree)."""
    ns = load_reference()
    with pushd(ns.workdir):
        model = ns.seq.TwoHierSAVAEModel(hp)
    return model


def build_trajectory(hp):
    ns = load_reference()
    with pushd(ns.workdir):
        model = ns.traj.TrajectoryModel(hp)
    return model


def make_batch_tuple(torch, rot6d, rotmat, root_v=None):
    """Assemble the reference forward()'s 7-tuple data contract
    (seq_two_hier_sa_vae.py:338-346); only rot6d/rotmat/root_v are consumed.

    rot6d: (B,T,24,6) numpy; rotmat: (B,T,24,3,3) numpy.
    """
    B, T = rot6d.shape[:2]
    z3 = torch.zeros(B, T, 72)
    if root_v is None:
        root_v = np.zeros((B, T, 3), np.float32)
    return (
        torch.from_numpy(rot6d.reshape(B, T, -1).copy()).float(),
        torch.from_numpy(rotmat.reshape(B, T, -1).copy()).float(),
        z3, z3.clone(), z3.clone(), z3.clone(),
        torch.from_numpy(np.asarray(root_v, np.float32).copy()),
    )


def deterministic_z(model):
    """Make the reference model's reparametrize return the mean, so forward
    is deterministic (mirrors our side's ``sample=False``)."""
    model.reparametrize = lambda mu, logvar: mu
    return model
