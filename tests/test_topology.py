"""Golden tests for the skeleton topology cascade.

Golden values come from the reference's recorded cascade for the SMPL-24 tree
(``/root/reference/skeleton.py:464-477``) and its hard-coded per-level
neighbour documentation (``skeleton.py:413-427``).
"""

import numpy as np

from hm_vae_tpu.ops import topology as tp


def test_edges_from_parents():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)
    assert len(edges) == 24
    assert edges[0] == (0, 24)  # virtual root edge
    assert edges[1] == (0, 1)
    assert edges[23] == (21, 23)
    # edge index == joint index for non-virtual edges
    for i in range(1, 24):
        assert edges[i][1] == i


GOLDEN_SEQ_L0 = [[0], [1, 4, 7, 10], [2, 5, 8, 11], [3, 6, 9], [12, 15],
                 [13, 16, 18, 20, 22], [14, 17, 19, 21, 23]]
GOLDEN_POOL_L0 = [[0], [1, 4], [7, 10], [2, 5], [8, 11], [3], [6, 9],
                  [12, 15], [13], [16, 18], [20, 22], [14], [17, 19], [21, 23]]
GOLDEN_EDGES_L1 = [(0, 24), (0, 4), (4, 10), (0, 5), (5, 11), (0, 3), (3, 9),
                   (9, 15), (9, 13), (13, 18), (18, 22), (9, 14), (14, 19),
                   (19, 23)]
GOLDEN_POOL_L1 = [[0], [1, 2], [3, 4], [5, 6], [7], [8], [9, 10], [11], [12, 13]]
GOLDEN_EDGES_L2 = [(0, 24), (0, 10), (0, 11), (0, 9), (9, 15), (9, 13),
                   (13, 22), (9, 14), (14, 23)]
GOLDEN_POOL_L2 = [[0], [1], [2], [3], [4], [5, 6], [7, 8]]
GOLDEN_EDGES_L3 = [(0, 24), (0, 10), (0, 11), (0, 9), (9, 15), (9, 22), (9, 23)]


def test_pooling_cascade_golden():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)

    seq, pool, new_edges = tp.pool_edges(edges)
    assert seq == GOLDEN_SEQ_L0
    assert pool == GOLDEN_POOL_L0
    assert [tuple(e) for e in new_edges] == GOLDEN_EDGES_L1

    _, pool1, edges2 = tp.pool_edges(new_edges)
    assert pool1 == GOLDEN_POOL_L1
    assert [tuple(e) for e in edges2] == GOLDEN_EDGES_L2

    _, pool2, edges3 = tp.pool_edges(edges2)
    assert pool2 == GOLDEN_POOL_L2
    assert [tuple(e) for e in edges3] == GOLDEN_EDGES_L3

    # last level collapses each single-edge chain (identity pooling)
    _, pool3, _ = tp.pool_edges(edges3, last_pool=True)
    assert pool3 == [[0], [1], [2], [3], [4], [5], [6]]


def test_cascade_edge_counts():
    casc = tp.get_cascade()
    assert casc.edge_num[:4] == [24, 14, 9, 7]
    assert casc.pooled_edge_num == [14, 9, 7, 7]


def test_pooling_matrix_mean_and_unpool_copy():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)
    _, pool, _ = tp.pool_edges(edges)
    c = 3
    W = tp.pooling_matrix(pool, len(edges), c)
    assert W.shape == (14 * c, 24 * c)
    # each row sums to 1 (mean), each input column participates exactly once
    np.testing.assert_allclose(W.sum(axis=1), np.ones(14 * c))
    np.testing.assert_allclose(W.astype(bool).sum(axis=0), np.ones(24 * c))

    U = tp.unpooling_matrix(pool, c)
    assert U.shape == (24 * c, 14 * c)
    # unpool copies: every output edge row has exactly one 1
    np.testing.assert_allclose(U.sum(axis=1), np.ones(24 * c))
    # unpool o pool restricted to singleton groups is identity on those rows
    x = np.random.default_rng(0).normal(size=(24 * c,)).astype(np.float32)
    y = U @ (W @ x)
    np.testing.assert_allclose(y[:c], x[:c], rtol=1e-6)  # edge 0 is singleton


def test_neighbour_lists_symmetric_and_contain_self():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)
    for d in (1, 2):
        nbrs = tp.neighbour_lists(edges, d)
        for i, lst in enumerate(nbrs):
            assert i in lst
            for j in lst:
                assert i in nbrs[j]


def test_distance_matrix_basics():
    edges = tp.edges_from_parents(tp.SMPL24_PARENTS)
    dist = tp.edge_distance_matrix(edges)
    assert dist[0, 0] == 0
    # virtual root edge (0,24) touches joint 0; edge (0,1) shares joint 0
    assert dist[0, 1] == 1
    # left index finger edge (21->23) is far from left hip edge (0->1)
    assert dist[23, 1] > 4


def test_conv_channel_mask_blocks():
    nbrs = [[0, 1], [0, 1, 2], [1, 2]]
    m = tp.conv_channel_mask(nbrs, in_channels_per_edge=2, out_channels_per_edge=3)
    assert m.shape == (9, 6)
    # out block 0 sees in blocks 0,1 only
    assert m[0:3, 0:4].all() and not m[0:3, 4:6].any()
    # out block 2 sees in blocks 1,2 only
    assert m[6:9, 2:6].all() and not m[6:9, 0:2].any()
