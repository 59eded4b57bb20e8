"""Static skeleton topology: edge graph, neighbourhoods, pooling cascade.

Everything in this module is *trace-time* metadata: plain Python / numpy computed
once at model-build time and baked into jitted functions as constants.  The
reference computes the same quantities inside ``nn.Module`` constructors
(``/root/reference/skeleton.py:159-231, 306-315, 364-410``); here they live in a
cached, immutable :class:`SkeletonCascade` so every jitted function sees static
shapes and constant pooling matrices (which XLA folds into the program).

Capability parity notes (file:line cite into /root/reference):
- virtual root edge ``(0, n_joints)`` prepended so edge count == joint count and
  the root survives pooling (``skeleton.py:306-315``);
- chain pooling with splits at joints of degree>2 (``skeleton.py:180-207``);
- all-pairs edge distance via Floyd-Warshall (``skeleton.py:364-387``);
- golden cascade for the SMPL-24 tree: 24 -> 14 -> 9 -> 7 edges
  (``skeleton.py:464-477``).
"""

from __future__ import annotations

import functools
import json
import os
from typing import List, Sequence, Tuple

import numpy as np

# SMPL 24-joint parent list (same content as assets/joint24_parents.json;
# reference loads it from utils/data/joint24_parents.json).
# 0: Pelvis, 1: L_Hip, 2: R_Hip, 3: Spine1, 4: L_Knee, 5: R_Knee, 6: Spine2,
# 7: L_Ankle, 8: R_Ankle, 9: Spine3, 10: L_Foot, 11: R_Foot, 12: Neck,
# 13: L_Collar, 14: R_Collar, 15: Head, 16: L_Shoulder, 17: R_Shoulder,
# 18: L_Elbow, 19: R_Elbow, 20: L_Wrist, 21: R_Wrist, 22: L_Index1, 23: R_Index1
SMPL24_PARENTS: Tuple[int, ...] = (
    -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19,
    20, 21,
)

# Vendored inside the package so a pip-installed wheel ships them (the
# reference keeps these under utils/data/ and loads some via hard-coded
# absolute paths — fk_layer.py:18-19 — which the rebuild must not reproduce).
ASSETS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def load_parents(parents_json: str | None = None) -> Tuple[int, ...]:
    """Load a joint parent list from json (defaults to the vendored SMPL-24)."""
    if parents_json is None:
        parents_json = os.path.join(ASSETS_DIR, "joint24_parents.json")
    with open(parents_json, "r") as f:
        return tuple(json.load(f))


Edge = Tuple[int, int]


def edges_from_parents(parents: Sequence[int]) -> List[Edge]:
    """Edge list with a leading virtual root edge.

    Edge 0 is the virtual edge ``(0, n_joints)`` (virtual node as *child* so the
    edge is never merged away by pooling); edge ``i`` for ``i >= 1`` is
    ``(parents[i], i)``.  Hence edge index == joint index, which is what lets the
    model treat per-joint feature blocks as per-edge feature blocks.
    Mirrors the behaviour of ``get_edges`` (``skeleton.py:306-315``).
    """
    n = len(parents)
    edges: List[Edge] = [(0, n)]
    for i in range(1, n):
        edges.append((parents[i], i))
    return edges


def edge_distance_matrix(edges: Sequence[Edge]) -> np.ndarray:
    """All-pairs distance between edges of the skeleton graph.

    Two edges are at distance 1 if they share a vertex; Floyd-Warshall closes
    the metric.  Same semantics as ``calc_edge_mat`` (``skeleton.py:364-387``),
    vectorised with numpy instead of triple Python loops.
    """
    n = len(edges)
    ev = np.asarray(edges, dtype=np.int64)  # (n, 2)
    # adjacency: edges sharing any endpoint
    shares = (
        (ev[:, None, 0] == ev[None, :, 0])
        | (ev[:, None, 0] == ev[None, :, 1])
        | (ev[:, None, 1] == ev[None, :, 0])
        | (ev[:, None, 1] == ev[None, :, 1])
    )
    big = np.iinfo(np.int64).max // 4
    dist = np.where(shares, 1, big)
    np.fill_diagonal(dist, 0)
    for k in range(n):
        dist = np.minimum(dist, dist[:, k : k + 1] + dist[k : k + 1, :])
    return dist


def neighbour_lists(edges: Sequence[Edge], d: int) -> List[List[int]]:
    """Per-edge list of edge indices within graph distance ``d``.

    Matches ``find_neighbor`` (``skeleton.py:390-410``).
    """
    dist = edge_distance_matrix(edges)
    return [list(np.nonzero(dist[i] <= d)[0]) for i in range(len(edges))]


def pool_edges(
    edges: Sequence[Edge], last_pool: bool = False
) -> Tuple[List[List[int]], List[List[int]], List[Edge]]:
    """Derive the chain-merging pooling for one level.

    Walks chains from the root (or from any joint of degree>2) toward leaves,
    merging consecutive edge pairs; odd-length chains keep their first edge
    unmerged.  With ``last_pool`` each chain collapses entirely (and no new edge
    list is produced).  Faithful re-derivation of ``SkeletonPool.__init__``
    (``skeleton.py:159-207``) as a pure function.

    Returns ``(seq_list, pooling_list, new_edges)``.
    """
    degree: dict[int, int] = {}
    for a, b in edges:
        degree[a] = degree.get(a, 0) + 1
        degree[b] = degree.get(b, 0) + 1

    seq_list: List[List[int]] = []

    def find_seq(j: int, seq: List[int]) -> None:
        if degree.get(j, 0) > 2 and j != 0:
            seq_list.append(seq)
            seq = []
        if degree.get(j, 0) == 1:
            seq_list.append(seq)
            return
        for idx, e in enumerate(edges):
            if e[0] == j:
                find_seq(e[1], seq + [idx])

    find_seq(0, [])

    pooling_list: List[List[int]] = []
    new_edges: List[Edge] = []
    for seq in seq_list:
        if last_pool:
            pooling_list.append(seq)
            continue
        if len(seq) % 2 == 1:
            pooling_list.append([seq[0]])
            new_edges.append(tuple(edges[seq[0]]))
            seq = seq[1:]
        for i in range(0, len(seq), 2):
            pooling_list.append([seq[i], seq[i + 1]])
            new_edges.append((edges[seq[i]][0], edges[seq[i + 1]][1]))
    return seq_list, pooling_list, new_edges


def pooling_matrix(
    pooling_list: Sequence[Sequence[int]], in_edge_num: int, channels_per_edge: int
) -> np.ndarray:
    """Fixed mean-pooling matrix ``(k_edges*c, n_edges*c)``.

    Row block ``i`` averages the channel blocks of the edges merged into pooled
    edge ``i`` (``skeleton.py:219-231``).  Built blockwise via a kron with the
    identity instead of the reference's triple loop.
    """
    k = len(pooling_list)
    sel = np.zeros((k, in_edge_num), dtype=np.float32)
    for i, pair in enumerate(pooling_list):
        for j in pair:
            sel[i, j] = 1.0 / len(pair)
    return np.kron(sel, np.eye(channels_per_edge, dtype=np.float32))


def unpooling_matrix(
    pooling_list: Sequence[Sequence[int]], channels_per_edge: int
) -> np.ndarray:
    """Fixed unpooling (copy-back) matrix ``(n_edges*c, k_edges*c)``.

    Transpose-structured 0/1 matrix copying each pooled edge's channels to all
    constituent edges (``skeleton.py:234-261``).
    """
    k = len(pooling_list)
    out_edge_num = sum(len(p) for p in pooling_list)
    sel = np.zeros((out_edge_num, k), dtype=np.float32)
    for i, pair in enumerate(pooling_list):
        for j in pair:
            sel[j, i] = 1.0
    return np.kron(sel, np.eye(channels_per_edge, dtype=np.float32))


def conv_channel_mask(
    neighbour_list: Sequence[Sequence[int]],
    in_channels_per_edge: int,
    out_channels_per_edge: int,
) -> np.ndarray:
    """0/1 mask ``(C_out, C_in)`` restricting each edge's outputs to neighbour inputs.

    The temporal (kernel) axis is fully dense, so the 3-D weight mask of the
    reference (``skeleton.py:58-61``) is this 2-D mask broadcast over K.
    """
    n = len(neighbour_list)
    sel = np.zeros((n, n), dtype=np.float32)
    for i, nbrs in enumerate(neighbour_list):
        sel[i, list(nbrs)] = 1.0
    return np.kron(
        sel, np.ones((out_channels_per_edge, in_channels_per_edge), dtype=np.float32)
    )


class SkeletonCascade:
    """Immutable per-level topology metadata for the full pooling cascade.

    ``levels[i]`` describes encoder level ``i`` operating on ``edge_num[i]``
    edges.  Instances are cached and compared by identity so they can be used
    as static attributes of flax modules.
    """

    def __init__(self, parents: Sequence[int], num_layers: int, skeleton_dist: int):
        self.parents = tuple(parents)
        self.num_layers = num_layers
        self.skeleton_dist = skeleton_dist

        self.topologies: List[List[Edge]] = [edges_from_parents(self.parents)]
        self.neighbours: List[List[List[int]]] = []
        self.pooling_lists: List[List[List[int]]] = []
        self.edge_num: List[int] = [len(self.topologies[0])]

        for i in range(num_layers):
            edges = self.topologies[i]
            self.neighbours.append(neighbour_lists(edges, skeleton_dist))
            last = i == num_layers - 1
            _, pooling_list, new_edges = pool_edges(edges, last_pool=last)
            self.pooling_lists.append(pooling_list)
            self.topologies.append(new_edges)
            # after a last_pool the "pooled" edge count is len(pooling_list)
            self.edge_num.append(
                len(pooling_list) if last else len(new_edges)
            )

        # Pooled edge counts seen by the latent heads: for the last level the
        # pool is chain-collapse (identity for SMPL-24), so the feature map has
        # len(pooling_lists[-1]) edge slots.
        self.pooled_edge_num: List[int] = [
            len(pl) for pl in self.pooling_lists
        ]

    def __hash__(self):  # identity semantics: instances come from the cache
        return id(self)

    def __eq__(self, other):
        return self is other


@functools.lru_cache(maxsize=None)
def get_cascade(
    parents: Tuple[int, ...] = SMPL24_PARENTS,
    num_layers: int = 4,
    skeleton_dist: int = 2,
) -> SkeletonCascade:
    return SkeletonCascade(parents, num_layers, skeleton_dist)
