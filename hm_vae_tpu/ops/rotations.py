"""Rotation-representation transforms (6D <-> matrix, axis-angle -> matrix).

Pure jnp, batch-shape agnostic (all functions accept arbitrary leading dims),
fp32 math.  Conventions match the reference exactly:

- The 6D representation is the **first two columns** of the rotation matrix,
  flattened ``[col0(3), col1(3)]`` (``seq_two_hier_sa_vae.py:666-667, 773-779``).
- 6D -> matrix is the Zhou et al. Gram-Schmidt with the reference's column
  stacking and cross-product ordering (``my_tools.py:19-39``): x = norm(a),
  z = norm(x × b), y = z × x, columns (x, y, z).
- axis-angle -> matrix replaces ``torchgeometry.angle_axis_to_rotation_matrix``
  (used at ``seq_two_hier_sa_vae.py:644-654``) with a Rodrigues formula.
- A VIBE-convention converter is kept for interop
  (``trajectory_pred_model.py:534-537``).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def normalize(v: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """L2-normalise along the last axis; mirrors ``F.normalize(dim=-1, eps)``."""
    norm = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(norm, eps)


def mat3_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3, 3) as VPU elementwise multiply-adds.

    On TPU a batched tiny dot pads the 3x3 contraction onto full MXU tiles:
    measured ~270us per op at batch 640x24 (HIGHEST precision) vs ~2us for
    this broadcast-multiply-reduce — 25x on an FK-shaped chain, bitwise-f32
    accurate.  Use for all small fixed-size rotation algebra.
    """
    return (a[..., :, :, None] * b[..., None, :, :]).sum(axis=-2)


def mat3_apply(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3) via elementwise ops (see mat3_mul)."""
    return (a * v[..., None, :]).sum(axis=-1)


def rot6d_to_rotmat(poses: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3); reference ``rotation_matrix_from_ortho6d``."""
    x_raw = poses[..., 0:3]
    y_raw = poses[..., 3:6]
    x = normalize(x_raw)
    z = normalize(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack((x, y, z), axis=-1)  # columns


def rotmat_to_rot6d(rotmat: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 6): first two columns flattened."""
    return jnp.concatenate((rotmat[..., :, 0], rotmat[..., :, 1]), axis=-1)


def rot6d_ours_to_vibe(poses: jnp.ndarray) -> jnp.ndarray:
    """Reorder our 6D (two stacked columns) into VIBE layout (row-interleaved).

    VIBE/SPIN treat the 6 numbers as a (3, 2) matrix read row-major; ours is a
    (2, 3) stack of columns, so interop is a transpose of that 2x3 block
    (``trajectory_pred_model.py:534-537``).
    """
    two_cols = poses.reshape(poses.shape[:-1] + (2, 3))
    return jnp.swapaxes(two_cols, -1, -2).reshape(poses.shape)


def rot6d_vibe_to_ours(poses: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rot6d_ours_to_vibe` (same transpose)."""
    three_two = poses.reshape(poses.shape[:-1] + (3, 2))
    return jnp.swapaxes(three_two, -1, -2).reshape(poses.shape)


def rot6d_to_rotmat_spin(x: jnp.ndarray) -> jnp.ndarray:
    """SPIN/VIBE-convention 6D -> matrix (Gram-Schmidt on (3,2) columns).

    Kept for cross-convention checks, mirroring ``rot6d_to_rotmat_spin`` /
    VIBE's ``rot6d_to_rotmat`` (``my_tools.py:41-81``): input read as a (3, 2)
    matrix, b2 orthogonalised against b1, b3 = b1 x b2.
    """
    m = x.reshape(x.shape[:-1] + (3, 2))
    a1, a2 = m[..., 0], m[..., 1]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack((b1, b2, b3), axis=-1)


def aa_to_rotmat(aa: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) via Rodrigues.

    Written in the outer-product closed form
    ``R = cos I + (1-cos) aa^T + sin [a]_x`` with every entry a scalar
    expression — purely VPU-elementwise on TPU.  The usual ``K @ K``
    formulation lowers 3-wide matmuls onto full MXU tiles, measured 25x
    slower at these shapes (BASELINE.md "3x3 rotation algebra").
    Taylor-safe around the identity (angle -> 0: R = I + [aa]_x).
    """
    angle = jnp.linalg.norm(aa, axis=-1, keepdims=True)  # (..., 1)
    safe_angle = jnp.maximum(angle, eps)
    axis = aa / safe_angle
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    s = jnp.sin(angle)[..., 0]
    c = jnp.cos(angle)[..., 0]
    # angle ~ 0: first-order R = I + [aa]_x keeps gradients finite
    small = angle[..., 0] < 1e-4
    s = jnp.where(small, safe_angle[..., 0], s)
    d = jnp.where(small, jnp.zeros_like(c), 1.0 - c)
    cc = jnp.where(small, jnp.ones_like(c), c)
    xx, yy, zz = d * x * x, d * y * y, d * z * z
    xy, xz, yz = d * x * y, d * x * z, d * y * z
    sx, sy, sz = s * x, s * y, s * z
    row0 = jnp.stack([cc + xx, xy - sz, xz + sy], axis=-1)
    row1 = jnp.stack([xy + sz, cc + yy, yz - sx], axis=-1)
    row2 = jnp.stack([xz - sy, yz + sx, cc + zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_aa(rotmat: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3), robust SO(3) log.

    Mirrors the C++ loader's sidecar log map (``hm_vae_tpu/native/loader.cpp``):
    ``theta = atan2(|skew|, trace-1)`` is well-conditioned over all of
    [0, pi] — the plain ``acos((tr-1)/2)`` form loses ~1e-2 of |aa| near
    ``theta = pi`` where its derivative blows up as ``1/sin`` — and near pi
    the axis comes from the SYMMETRIC part (``a_i^2 = (R_ii - cos)/(1-cos)``,
    O(1)-conditioned there) instead of the vanishing skew part.  Fully
    branchless (``jnp.where`` selects), so it vectorises on the VPU.
    """
    tr = rotmat[..., 0, 0] + rotmat[..., 1, 1] + rotmat[..., 2, 2]
    vx = rotmat[..., 2, 1] - rotmat[..., 1, 2]
    vy = rotmat[..., 0, 2] - rotmat[..., 2, 0]
    vz = rotmat[..., 1, 0] - rotmat[..., 0, 1]
    vn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    theta = jnp.arctan2(vn, tr - 1.0)

    # skew-part axis; theta/vn -> 1/2 smoothly as theta -> 0
    k = jnp.where(vn < 1e-12, 0.5, theta / jnp.maximum(vn, eps))
    aa_skew = k[..., None] * jnp.stack([vx, vy, vz], axis=-1)

    # symmetric-part axis for theta near pi; signs fixed off the largest
    # component, overall sign from the (tiny but directional) skew part
    cos_t = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    d = jnp.maximum(1.0 - cos_t, eps)
    sq = lambda x: jnp.sqrt(jnp.maximum(x, 0.0))  # noqa: E731
    ax = sq((rotmat[..., 0, 0] - cos_t) / d)
    ay = sq((rotmat[..., 1, 1] - cos_t) / d)
    az = sq((rotmat[..., 2, 2] - cos_t) / d)
    sxy = rotmat[..., 0, 1] + rotmat[..., 1, 0]
    sxz = rotmat[..., 0, 2] + rotmat[..., 2, 0]
    syz = rotmat[..., 1, 2] + rotmat[..., 2, 1]
    two_d = 2.0 * d
    # per-case sign fixes (guarded denominators; unselected lanes are junk
    # but finite, jnp.where discards them)
    ay_x = sxy / jnp.maximum(two_d * ax, eps)
    az_x = sxz / jnp.maximum(two_d * ax, eps)
    ax_y = sxy / jnp.maximum(two_d * ay, eps)
    az_y = syz / jnp.maximum(two_d * ay, eps)
    ax_z = sxz / jnp.maximum(two_d * az, eps)
    ay_z = syz / jnp.maximum(two_d * az, eps)
    cx = (ax >= ay) & (ax >= az)
    cy = (~cx) & (ay >= az)
    axf = jnp.where(cx, ax, jnp.where(cy, ax_y, ax_z))
    ayf = jnp.where(cx, ay_x, jnp.where(cy, ay, ay_z))
    azf = jnp.where(cx, az_x, jnp.where(cy, az_y, az))
    flip = jnp.where(vx * axf + vy * ayf + vz * azf < 0, -1.0, 1.0)
    a_sym = flip[..., None] * jnp.stack([axf, ayf, azf], axis=-1)
    aa_sym = theta[..., None] * a_sym

    return jnp.where(theta[..., None] < 3.0, aa_skew, aa_sym)
