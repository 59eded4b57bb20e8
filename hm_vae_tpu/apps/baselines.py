"""SLERP / LERP interpolation baselines (host-side scipy, eval only).

Parity with ``slerp_baseline_for_interpolation`` / ``lerp_root_trajectory``
(``seq_two_hier_sa_vae.py:972-1029``).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial.transform import Rotation as R, Slerp


def slerp_rotations(rot_data: np.ndarray, temporal_mask: np.ndarray) -> np.ndarray:
    """Spherical interpolation of per-joint rotations at masked keyframes.

    rot_data: (T, J, 3, 3); temporal_mask: (T,) 1 = keyframe.
    The final frame is always treated as a keyframe so Slerp covers [0, T-1].
    Vectorised over joints via a single stacked Slerp call per joint.
    """
    T, J = rot_data.shape[:2]
    key_idx = np.nonzero(temporal_mask)[0]
    if key_idx[-1] != T - 1:
        key_idx = np.concatenate([key_idx, [T - 1]])
    times = np.arange(T)
    out = np.empty_like(rot_data)
    for j in range(J):
        key_rots = R.from_matrix(rot_data[key_idx, j])
        out[:, j] = Slerp(key_idx, key_rots)(times).as_matrix()
    return out.astype(rot_data.dtype)


def lerp_root_trajectory(root_trans: np.ndarray, temporal_mask: np.ndarray) -> np.ndarray:
    """Linear interpolation of the (T, 3) root trajectory at keyframes."""
    T = root_trans.shape[0]
    key_idx = np.nonzero(temporal_mask)[0]
    times = np.arange(T)
    out = np.empty_like(root_trans)
    for d in range(root_trans.shape[1]):
        out[:, d] = np.interp(times, key_idx, root_trans[key_idx, d])
    return out
