"""Evaluation metrics: MPJPE, PA-MPJPE, acceleration error.

The reference *stubs these out* in its public release
(``trajectory_pred_model.py:478-485, 597-604`` are ``pass``; they came from
VIBE's ``lib.utils.eval_utils``).  The rebuild needs them for its own
north-star parity reporting, so they are implemented here (jnp, batched).
"""

from __future__ import annotations

import jax.numpy as jnp


def mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean per-joint position error: (..., J, 3) -> scalar (same units)."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def pa_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE: optimal similarity transform per sample.

    pred/gt: (B, J, 3).  Standard Umeyama alignment (the torch batched
    version lives in VIBE's ``batch_compute_similarity_transform_torch``).
    """
    mu_p = pred.mean(axis=-2, keepdims=True)
    mu_g = gt.mean(axis=-2, keepdims=True)
    X = pred - mu_p
    Y = gt - mu_g
    # covariance (B, 3, 3)
    C = jnp.einsum("bji,bjk->bik", Y, X)
    U, s, Vt = jnp.linalg.svd(C)
    # reflection fix
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt))
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    Rm = jnp.einsum("bij,bj,bjk->bik", U, D, Vt)
    var_x = jnp.sum(X**2, axis=(-1, -2))
    scale = (s[..., :2].sum(axis=-1) + s[..., 2] * det) / jnp.maximum(var_x, 1e-8)
    aligned = scale[:, None, None] * jnp.einsum("bij,bkj->bki", Rm, X) + mu_g
    return jnp.mean(jnp.linalg.norm(aligned - gt, axis=-1))


def trajectory_ade(pred_trans: jnp.ndarray, gt_trans: jnp.ndarray) -> jnp.ndarray:
    """Average displacement error of (..., T, 3) root trajectories."""
    return jnp.mean(jnp.linalg.norm(pred_trans - gt_trans, axis=-1))


def trajectory_fde(pred_trans: jnp.ndarray, gt_trans: jnp.ndarray) -> jnp.ndarray:
    """Final displacement error: distance at the last timestep."""
    return jnp.mean(
        jnp.linalg.norm(pred_trans[..., -1, :] - gt_trans[..., -1, :], axis=-1))


def vertex_error(pred_verts: jnp.ndarray, gt_verts: jnp.ndarray) -> jnp.ndarray:
    """Mean per-vertex position error over (..., V, 3) mesh vertices.

    The mesh-space analogue of :func:`mpjpe` — VIBE's ``compute_error_verts``
    (imported-but-stubbed at ``trajectory_pred_model.py:12-17``).
    """
    return jnp.mean(jnp.linalg.norm(pred_verts - gt_verts, axis=-1))


def vertex_error_from_rotmats(smpl_model, pred_rotmat, gt_rotmat,
                              pred_transl=None, gt_transl=None) -> float:
    """Pose an SMPL body with both rotation sets and compare meshes.

    ``smpl_model``: a :class:`~hm_vae_tpu.utils.smpl.SMPLBodyModel` (the
    user supplies the licensed model file).  rotmats: (T, 24, 3, 3).
    Host-side convenience for eval scripts; returns a python float.
    """
    pred_v = smpl_model.forward(pred_rotmat, transl=pred_transl)
    gt_v = smpl_model.forward(gt_rotmat, transl=gt_transl)
    return float(vertex_error(jnp.asarray(pred_v), jnp.asarray(gt_v)))


def accel(joints: jnp.ndarray) -> jnp.ndarray:
    """Mean acceleration magnitude of (T, J, 3) joints (VIBE compute_accel)."""
    a = joints[2:] - 2 * joints[1:-1] + joints[:-2]
    return jnp.mean(jnp.linalg.norm(a, axis=-1))


def accel_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean acceleration error between (T, J, 3) trajectories."""
    ap = pred[2:] - 2 * pred[1:-1] + pred[:-2]
    ag = gt[2:] - 2 * gt[1:-1] + gt[:-2]
    return jnp.mean(jnp.linalg.norm(ap - ag, axis=-1))
