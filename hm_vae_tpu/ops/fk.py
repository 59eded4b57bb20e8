"""Differentiable forward kinematics over a joint tree, as level-batched matmuls.

The reference walks joints 1..23 in a sequential Python loop of 4x4 matmuls
(``fk_layer.py:63-80``) — 23 serialized tiny matmuls per frame.  Here the tree
is preprocessed (trace time) into a *level schedule*: joints grouped by depth.
FK is then ``depth`` (= 6 for SMPL-24) steps, each a single batched 3x3 matmul
over all joints at that depth — wide, MXU/VPU-friendly work instead of a scalar
chain, and the same op count under ``vmap`` over batch*time.

We use 3x3 rotations + translation vectors instead of the reference's 4x4
homogeneous transforms (``fk_layer.py:47-61``): same math, 44% fewer FLOPs.

Joint positions returned are identical to ``ForwardKinematicsLayer.forward``
(``fk_layer.py:82-93``): ``pos[0] = offset[0]`` (the root local translation is
applied), ``pos[j] = pos[parent] + R_global[parent] @ offset[j]``.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .topology import ASSETS_DIR, SMPL24_PARENTS
from .rotations import mat3_apply, mat3_mul, rot6d_to_rotmat


@functools.lru_cache(maxsize=None)
def level_schedule(parents: Tuple[int, ...]) -> Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]], ...]:
    """Group joints by tree depth.

    Returns a tuple of ``(joint_indices, parent_indices)`` per depth level,
    excluding the root (depth 0).  Static metadata baked into jitted FK.
    """
    depth = [0] * len(parents)
    for j in range(1, len(parents)):
        depth[j] = depth[parents[j]] + 1
    levels: List[Tuple[List[int], List[int]]] = []
    for d in range(1, max(depth) + 1):
        joints = [j for j in range(len(parents)) if depth[j] == d]
        if joints:
            levels.append((tuple(joints), tuple(parents[j] for j in joints)))
    return tuple(levels)


@functools.lru_cache(maxsize=None)
def doubling_schedule(parents: Tuple[int, ...]) -> Tuple[np.ndarray, ...]:
    """Parent-pointer jump tables for parallel-prefix FK.

    Entry k is the ancestor-pointer table after 2^k hops, over an augmented
    joint set with a virtual identity node appended (index J): the root points
    at the virtual node and the virtual node at itself, so compositions
    saturate at the identity.  ceil(log2(depth)) tables total.
    """
    J = len(parents)
    depth = [0] * J
    for j in range(1, J):
        depth[j] = depth[parents[j]] + 1
    p = np.empty(J + 1, np.int64)
    p[0] = J
    for j in range(1, J):
        p[j] = parents[j]
    p[J] = J
    tables = []
    hops = 1
    while hops < max(depth) + 1:
        tables.append(p.copy())
        p = p[p]
        hops *= 2
    return tuple(tables)


def fk_doubling(
    rotmats: jnp.ndarray,
    offsets: jnp.ndarray,
    parents: Tuple[int, ...] = SMPL24_PARENTS,
    return_global_rot: bool = False,
):
    """FK positions via parallel prefix (pointer doubling) over affine
    transforms.

    The depth-levelled formulation (:func:`fk_from_rotmat`) runs one small
    batched matmul per tree level — 8 ragged steps for SMPL-24, dominated by
    per-op overheads on TPU.  Here global transforms compose by ancestor
    doubling: after step k every joint holds the product of its nearest 2^k
    ancestors, so ceil(log2(depth)) = 4 *uniform full-width* steps suffice:

        (R_j, t_j) <- (R_{p_j} @ R_j,  R_{p_j} @ t_j + t_{p_j});  p <- p o p

    Same math, ~2x fewer (and wider) ops; measured ~2x faster than the level
    schedule on v5e inside a training scan.
    """
    J = len(parents)
    tables = doubling_schedule(tuple(parents))
    off = jnp.asarray(offsets, dtype=rotmats.dtype)
    lead = rotmats.shape[:-3]
    r = rotmats.reshape((-1, J, 3, 3))
    N = r.shape[0]

    # augmented local transforms: joint j = (R_j, offset_j); virtual node = id
    eye = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (N, 1, 3, 3))
    G_R = jnp.concatenate([r, eye], axis=1)                     # (N, J+1, 3, 3)
    G_t = jnp.broadcast_to(off, (N, J, 3))
    G_t = jnp.concatenate([G_t, jnp.zeros((N, 1, 3), r.dtype)], axis=1)

    for p in tables:
        pa_R = G_R[:, p]                                        # (N, J+1, 3, 3)
        pa_t = G_t[:, p]
        G_t = mat3_apply(pa_R, G_t) + pa_t
        G_R = mat3_mul(pa_R, G_R)

    pos = G_t[:, :J].reshape(lead + (J, 3))
    if return_global_rot:
        return pos, G_R[:, :J].reshape(lead + (J, 3, 3))
    return pos


@functools.lru_cache(maxsize=None)
def ancestor_matrix(parents: Tuple[int, ...]) -> np.ndarray:
    """(J, J) 0/1 matrix: A[j, a] = 1 iff a == j or a is an ancestor of j.

    Lets FK positions close over the global rotations in ONE static matmul:
    with m_a = G_{parent(a)} @ offset_a (m_root = offset_root),
    p_j = sum_a A[j, a] m_a — the per-level positional accumulation of the
    naive formulation becomes a dense (J x J) contraction, which XLA maps to
    a single (MXU) dot instead of `depth` gather+add steps, and whose
    backward is a single transposed dot.
    """
    J = len(parents)
    A = np.zeros((J, J), np.float32)
    for j in range(J):
        a = j
        while a != -1 and a != 0:
            A[j, a] = 1.0
            a = parents[a]
        A[j, 0] = 1.0
    return A


@functools.lru_cache(maxsize=None)
def _fk_dense_schedule(parents: Tuple[int, ...]):
    """Static matrices for the scatter-free FK formulation.

    TPU scatter-adds serialize; backprop through the per-level
    ``.at[jidx].set`` / fancy-gather formulation emitted ~12 of them per FK
    and dominated the latent-opt solve (measured 715us/iter for FK fwd+bwd vs
    310us for the whole decoder fwd+bwd).  Here every joint-indexing step is
    a one-hot DENSE matmul, whose transpose (the VJP) is also a dense matmul:

      - ``PERM`` (J, J): permute the joint axis into level-major order;
      - ``P_d`` (L_d, L_{d-1}): select each level-d joint's parent from the
        level-(d-1) block (parents of depth-d joints always sit at depth d-1);
      - ``A_lvl`` (J, J): the ancestor-inclusion matrix with columns in
        level-major order — positions close over per-joint displacement
        vectors in one contraction;
      - ``INV`` (J, J): back-permutation for the global-rotation output.
    """
    levels = level_schedule(parents)
    J = len(parents)
    order = [0] + [j for joints, _ in levels for j in joints]
    PERM = np.zeros((J, J), np.float32)
    PERM[np.arange(J), order] = 1.0                 # x_perm = PERM @ x
    INV = PERM.T.copy()
    P_list = []
    prev_joints = [0]
    for joints, pars in levels:
        Pd = np.zeros((len(joints), len(prev_joints)), np.float32)
        for i, p in enumerate(pars):
            Pd[i, prev_joints.index(p)] = 1.0
        P_list.append(Pd)
        prev_joints = list(joints)
    A_lvl = ancestor_matrix(parents)[:, order].copy()
    off_order = np.asarray(order)
    lvl_sizes = [len(joints) for joints, _ in levels]
    return PERM, INV, tuple(P_list), A_lvl, off_order, tuple(lvl_sizes)


def _onehot_select(M: np.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """(P, J) one-hot/0-1 matrix applied over x's axis 1: (N, J, ...) ->
    (N, P, ...) as an elementwise broadcast-multiply-reduce.

    Both a J-gather and its VJP (a scatter-add) serialize on TPU, and a
    dot_general over a <=24-wide contraction pads onto full MXU tiles; the
    broadcasted form stays on the VPU and its VJP is the same shape of op.
    """
    Mx = jnp.asarray(M, x.dtype)
    expand = (None,) * (x.ndim - 2)
    return (Mx[(None, ..., *expand)] * x[:, None]).sum(axis=2)


@functools.lru_cache(maxsize=None)
def default_offsets() -> np.ndarray:
    """Rest-pose bone offsets (24, 3) vendored from the reference assets."""
    return np.load(os.path.join(ASSETS_DIR, "skeleton_offsets.npy")).astype(np.float32)


def fk_from_rotmat(
    rotmats: jnp.ndarray,
    offsets: jnp.ndarray,
    parents: Tuple[int, ...] = SMPL24_PARENTS,
    return_global_rot: bool = False,
):
    """FK positions from per-joint local rotation matrices.

    Args:
      rotmats: (..., J, 3, 3) local rotations.
      offsets: (J, 3) bone offsets in the parent frame.
      parents: joint parent list (static).

    Returns:
      (..., J, 3) joint positions (and optionally (..., J, 3, 3) global rots).
    """
    J = len(parents)
    PERM, INV, P_list, A_lvl, off_order, lvl_sizes = _fk_dense_schedule(
        tuple(parents))
    dt = rotmats.dtype
    off = jnp.asarray(offsets, dtype=dt)  # (J, 3)

    # Flatten leading dims to a single batch axis: one canonical (N, L, 3, 3)
    # dot shape per level (also sidesteps an XLA CPU simplifier crash seen
    # with >1 leading batch dims on batched 3x3 dots).
    lead = rotmats.shape[:-3]
    r = rotmats.reshape((-1, J, 3, 3))

    # level-major layout via a dense permutation (VJP = the same elementwise
    # op, not a scatter), then contiguous slices per level
    r_perm = _onehot_select(PERM, r)
    off_lvl = off[off_order]                      # static gather of a const

    # rotation chain: parent selection by one-hot dense matmul per level;
    # per-joint displacement m = G_parent @ offset falls out of the same
    # parent blocks.  No scatters anywhere — every VJP is a dense matmul —
    # and the 3x3 products run as VPU elementwise ops (mat3_mul), not padded
    # MXU tiny-dots.
    g_prev = r_perm[:, :1]
    g_blocks = [g_prev]
    N = r.shape[0]
    m_blocks = [jnp.broadcast_to(off_lvl[0], (N, 1, 3))]
    start = 1
    for Pd, L in zip(P_list, lvl_sizes):
        r_d = r_perm[:, start : start + L]
        par = _onehot_select(Pd, g_prev)
        g_prev = mat3_mul(par, r_d)
        g_blocks.append(g_prev)
        m_blocks.append(mat3_apply(par, off_lvl[start : start + L]))
        start += L

    # positions: one contraction with the level-ordered ancestor matrix
    mcat = jnp.concatenate(m_blocks, axis=1)      # (N, J, 3), level-major
    pos = _onehot_select(A_lvl, mcat)

    pos = pos.reshape(lead + (J, 3))
    if return_global_rot:
        gcat = jnp.concatenate(g_blocks, axis=1)
        g_rot = _onehot_select(INV, gcat)
        return pos, g_rot.reshape(lead + (J, 3, 3))
    return pos


def fk_from_rot6d(
    rot6d: jnp.ndarray,
    offsets: jnp.ndarray,
    parents: Tuple[int, ...] = SMPL24_PARENTS,
):
    """Fused 6D -> rotmat -> FK path for decoder outputs.

    Accepts (..., J, 6); the 6D->matrix conversion fuses into the level matmuls
    under XLA.  Equivalent to the reference's two-step path
    (``fk_layer.py:50-53`` + forward).
    """
    return fk_from_rotmat(rot6d_to_rotmat(rot6d), offsets, parents)


def fk_numpy(
    rotmats: np.ndarray,
    offsets: np.ndarray | None = None,
    parents: Tuple[int, ...] = SMPL24_PARENTS,
) -> np.ndarray:
    """Host-side numpy FK for data preparation (no XLA compile per shape).

    Same level-batched formulation as :func:`fk_from_rotmat`, vectorised over
    arbitrary leading dims.
    """
    if offsets is None:
        offsets = default_offsets()
    off = np.asarray(offsets, dtype=rotmats.dtype)
    J = len(parents)
    lead = rotmats.shape[:-3]
    r = rotmats.reshape((-1, J, 3, 3))
    g = np.zeros_like(r)
    g[:, 0] = r[:, 0]
    pos = np.zeros(r.shape[:-2] + (3,), dtype=r.dtype)
    pos[:, 0] = off[0]
    for joints, par in level_schedule(tuple(parents)):
        j = np.asarray(joints)
        p = np.asarray(par)
        g[:, j] = g[:, p] @ r[:, j]
        pos[:, j] = pos[:, p] + np.einsum("nlij,lj->nli", g[:, p], off[j])
    return pos.reshape(lead + (J, 3))


class ForwardKinematics:
    """Convenience wrapper binding offsets/parents (replaces the reference's
    ``ForwardKinematicsLayer`` without its hard-coded absolute asset paths,
    ``fk_layer.py:17-19``)."""

    def __init__(self, parents: Sequence[int] | None = None,
                 offsets: np.ndarray | None = None):
        self.parents = tuple(parents) if parents is not None else SMPL24_PARENTS
        self.offsets = (
            np.asarray(offsets, np.float32) if offsets is not None else default_offsets()
        )

    def __call__(self, rotations: jnp.ndarray) -> jnp.ndarray:
        """rotations: (..., J, 3, 3) or (..., J, 6) -> (..., J, 3) positions."""
        if rotations.shape[-1] == 6:
            return fk_from_rot6d(rotations, self.offsets, self.parents)
        return fk_from_rotmat(rotations, self.offsets, self.parents)
