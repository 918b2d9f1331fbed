"""Semantic dedup (operators/semantic.py): k-means clustering, within-
cluster cosine pruning, greedy-by-id survivor rule — verified against a
numpy brute-force oracle on the same cluster assignments."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.operators.semantic import (
    kmeans_assign,
    semantic_dedup,
    semantic_duplicate_pairs,
)

DIM = 8
EPS = 0.95


def _synthetic(seed=7):
    """3 well-separated centers; ids 0/1/2 are the center bases (so the
    deterministic lowest-id seeding starts with one seed per cluster);
    each center then gets near-duplicates (tiny perturbation) and a few
    genuinely distinct members."""
    rng = np.random.default_rng(seed)
    centers = np.array(
        [[10.0] + [0.0] * (DIM - 1),
         [0.0, 10.0] + [0.0] * (DIM - 2),
         [0.0, 0.0, 10.0] + [0.0] * (DIM - 3)]
    )
    rows = []
    # bases first: ids 0..2
    for c in range(3):
        rows.append((c, centers[c]))
    nid = 3
    for c in range(3):
        for _ in range(4):  # near-dups of the base (cos ~ 1)
            rows.append((nid, centers[c] + rng.normal(0, 0.01, DIM)))
            nid += 1
        for _ in range(3):  # distinct members (same cluster, low cos to base)
            v = centers[c] + rng.normal(0, 3.0, DIM)
            rows.append((nid, v))
            nid += 1
    return rows


@pytest.fixture(scope="module")
def sem_df(spark):
    rows = _synthetic()
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "id bigint, embedding array<double>",
    ).cache()


def _numpy_oracle(rows, assign, eps):
    """Expected (pairs, dropped) given the cluster assignment."""
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    by_cell: dict[int, list[int]] = {}
    for rid, cell in assign.items():
        by_cell.setdefault(cell, []).append(rid)
    pairs, dropped = set(), set()
    for members in by_cell.values():
        members = sorted(members)
        for ai, a in enumerate(members):
            for b in members[ai + 1:]:
                va, vb = vecs[a], vecs[b]
                na, nb = np.linalg.norm(va), np.linalg.norm(vb)
                cos = 0.0 if na == 0 or nb == 0 else round(float(va @ vb / (na * nb)), 6)
                if cos >= eps:
                    pairs.add((a, b))
                    dropped.add(b)
    return pairs, dropped


def test_kmeans_separates_the_obvious_clusters(spark, sem_df):
    assign = {r.rid: r.cell for r in kmeans_assign(sem_df, "id", "embedding", 3).collect()}
    assert len(assign) == sem_df.count()
    # bases 0/1/2 land in three different cells and every near-dup of a
    # base shares its cell (centers are 10σ apart)
    assert len({assign[0], assign[1], assign[2]}) == 3
    rows = _synthetic()
    for c in range(3):
        base_cell = assign[c]
        near_ids = [i for i, _ in rows if 3 + c * 7 <= i < 3 + c * 7 + 4]
        assert all(assign[i] == base_cell for i in near_ids)


def test_pairs_match_numpy_oracle(spark, sem_df):
    assignments = kmeans_assign(sem_df, "id", "embedding", 3)
    got = {
        (r.id_a, r.id_b)
        for r in semantic_duplicate_pairs(
            sem_df, "id", "embedding", 3, eps=EPS, assignments=assignments
        ).collect()
    }
    assign = {r.rid: r.cell for r in assignments.collect()}
    exp_pairs, _ = _numpy_oracle(_synthetic(), assign, EPS)
    assert got == exp_pairs
    assert got, "fixture must produce at least one semantic duplicate pair"


def test_dedup_survivors_match_greedy_rule(spark, sem_df):
    assignments = kmeans_assign(sem_df, "id", "embedding", 3)
    assign = {r.rid: r.cell for r in assignments.collect()}
    _, dropped = _numpy_oracle(_synthetic(), assign, EPS)
    survivors = {
        r.id
        for r in semantic_dedup(
            sem_df, "id", "embedding", 3, eps=EPS, assignments=assignments
        ).select("id").collect()
    }
    all_ids = {i for i, _ in _synthetic()}
    assert survivors == all_ids - dropped
    # each base survives (it is the lowest id of its near-dup group)
    assert {0, 1, 2} <= survivors


def test_eps_above_one_drops_nothing(spark, sem_df):
    out = semantic_dedup(sem_df, "id", "embedding", 3, eps=1.000001)
    assert out.count() == sem_df.count()


def test_zero_vectors_never_match(spark):
    df = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [0.0] * DIM), (2, [1.0] + [0.0] * (DIM - 1))],
        "id bigint, embedding array<double>",
    )
    # both zero vectors share a cell with something; cos defined as 0
    out = semantic_dedup(df, "id", "embedding", 1, eps=0.5)
    assert out.count() == 3


def test_hot_cell_guard_bounds_degenerate_clustering(spark, sem_df, caplog):
    """All rows in ONE cell (num_clusters=1 = the worst-case degenerate
    clustering): with max_cell_size set, the pair stage must split the
    cell into hash sub-cells — candidate pairs bounded below the
    unguarded Σ|cell|², the split logged, every emitted pair still a
    true >= eps pair."""
    import logging

    n = sem_df.count()
    assignments = kmeans_assign(sem_df, "id", "embedding", 1).localCheckpoint(eager=True)
    with caplog.at_level(logging.WARNING,
                         logger="flink_connector_lance_spark.operators.semantic"):
        guarded = semantic_duplicate_pairs(
            sem_df, "id", "embedding", 1, eps=EPS, assignments=assignments,
            max_cell_size=8,
        ).collect()
    assert any("max_cell_size" in r.message for r in caplog.records)
    unguarded = semantic_duplicate_pairs(
        sem_df, "id", "embedding", 1, eps=EPS, assignments=assignments,
        max_cell_size=None,
    ).collect()
    # the guard only SUBSETS the pair set (cross-sub-cell recall traded
    # for bounded candidates), and candidates are genuinely bounded:
    # ceil(n/8)=3 sub-cells cap any one join bucket at ~n/3 rows
    assert {(r.id_a, r.id_b) for r in guarded} <= {(r.id_a, r.id_b) for r in unguarded}
    # correctness of what IS emitted: exact >= eps pairs only
    assign = {r.rid: 0 for r in assignments.collect()}
    exp_pairs, _ = _numpy_oracle(_synthetic(), assign, EPS)
    assert {(r.id_a, r.id_b) for r in guarded} <= exp_pairs
    # a small cell (below the threshold) is untouched by the guard
    ok = semantic_duplicate_pairs(
        sem_df, "id", "embedding", 1, eps=EPS, assignments=assignments,
        max_cell_size=n,
    ).collect()
    assert {(r.id_a, r.id_b) for r in ok} == exp_pairs
    with pytest.raises(ValueError, match="max_cell_size"):
        semantic_duplicate_pairs(sem_df, "id", "embedding", 1,
                                 assignments=assignments, max_cell_size=1)


def test_candidate_plan_is_equi_join_not_nested_loop(spark, sem_df):
    # checkpoint the assignments: their own plan contains the DELIBERATE
    # rows x broadcast(centroids) product (the Lloyd assignment step);
    # the assertion targets the pair-generation half only
    assignments = kmeans_assign(sem_df, "id", "embedding", 3).localCheckpoint(eager=True)
    plan = semantic_duplicate_pairs(
        sem_df, "id", "embedding", 3, eps=EPS, assignments=assignments
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
