"""Pure-Python invariants of the HNSW core (no SparkSession): graph
structure bounds, determinism, and traversal behavior on small random
corpora. These run in milliseconds and pin the algorithm itself; the
Spark-level contract lives in tests/test_hnsw.py."""

from __future__ import annotations

import numpy as np
import pytest

from flink_connector_lance_spark.hnsw import (
    _build_cell_graph,
    _node_level,
    _traverse_cell,
)


def _graph(n=120, dim=8, m=6, efc=24, seed=3, metric="l2"):
    rng = np.random.RandomState(seed)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    mat = rng.standard_normal((n, dim))
    rows = list(_build_cell_graph(ids.copy(), mat.copy(), m, efc, 7, metric))
    return ids, mat, rows


def _adj_levels(rows):
    adj = {(i, layer): neigh for i, _lvl, layer, neigh in rows}
    levels = {}
    for i, lvl, _layer, _n in rows:
        levels[i] = lvl
    return adj, levels


@pytest.mark.parametrize("metric", ["l2", "cosine", "dot"])
def test_neighbor_lists_bounded_and_valid(metric):
    ids, _mat, rows = _graph(metric=metric)
    m = 6
    known = set(ids.tolist())
    for i, lvl, layer, neigh in rows:
        assert i in known
        assert 0 <= layer <= lvl <= 7
        cap = m if layer > 0 else 2 * m
        assert len(neigh) <= cap, (i, layer, len(neigh))
        assert all(x in known and x != i for x in neigh)
        assert len(set(neigh)) == len(neigh)


def test_every_node_present_with_its_level():
    ids, _mat, rows = _graph()
    _adj, levels = _adj_levels(rows)
    assert set(levels) == set(ids.tolist())
    for i in ids.tolist():
        assert levels[i] == _node_level(i, m=6, max_level=7)


def test_build_is_deterministic_and_order_insensitive():
    ids, mat, rows = _graph(seed=11)
    # same input, shuffled row order -> identical graph (build sorts by id)
    perm = np.random.RandomState(0).permutation(len(ids))
    rows2 = list(_build_cell_graph(ids[perm], mat[perm], 6, 24, 7, "l2"))
    key = lambda r: (r[0], r[2])
    assert sorted(rows, key=key) == sorted(rows2, key=key)


def test_traverse_full_ef_recovers_exact_topk():
    ids, mat, rows = _graph(n=150, seed=5)
    adj, levels = _adj_levels(rows)
    lv = np.array([levels[int(i)] for i in ids], dtype=np.int64)
    q = np.asarray(mat[17] + 0.01)
    got = _traverse_cell(ids, lv, adj, mat, q, pool=10, ef=300, metric="l2")
    d = np.sqrt(((mat - q) ** 2).sum(axis=1))
    want_idx = np.lexsort((ids, d))[:10]
    want = [(int(ids[j]), float(d[j])) for j in want_idx]
    assert [i for i, _ in got] == [i for i, _ in want]
    np.testing.assert_allclose([x for _, x in got], [x for _, x in want], rtol=1e-9)


def test_traverse_small_ef_returns_sorted_subset():
    ids, mat, rows = _graph(n=150, seed=5)
    adj, levels = _adj_levels(rows)
    lv = np.array([levels[int(i)] for i in ids], dtype=np.int64)
    q = np.asarray(mat[3] * 0.5)
    got = _traverse_cell(ids, lv, adj, mat, q, pool=5, ef=5, metric="l2")
    assert len(got) == 5
    ds = [x for _, x in got]
    assert ds == sorted(ds)
    assert len({i for i, _ in got}) == 5
    # a bigger ef can only improve (or tie) the best distance found
    big = _traverse_cell(ids, lv, adj, mat, q, pool=5, ef=150, metric="l2")
    assert big[0][1] <= got[0][1]


def test_single_node_and_tiny_graphs():
    for n in (1, 2, 3):
        ids = np.arange(n, dtype=np.int64)
        mat = np.arange(n * 4, dtype=np.float64).reshape(n, 4)
        rows = list(_build_cell_graph(ids, mat, 4, 8, 7, "l2"))
        adj, levels = _adj_levels(rows)
        lv = np.array([levels[int(i)] for i in ids], dtype=np.int64)
        got = _traverse_cell(ids, lv, adj, mat, np.zeros(4), pool=n, ef=8,
                             metric="l2")
        assert [i for i, _ in got] == list(range(n))  # row 0 nearest to 0-vec
