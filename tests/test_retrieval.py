"""Hybrid RRF retrieval (operators/retrieval.py): fusion math, argument
validation, and the FTS-indexed twin's equality with the full-scan path."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.retrieval import (
    hybrid_search,
    hybrid_search_indexed,
    rrf_fuse,
    with_rank,
)
from flink_connector_lance_spark.queries.knn import QVEC
from flink_connector_lance_spark.sources.datasource import register_lance_datasource
from flink_connector_lance_spark.sources.fts import create_fts_index

QUERY = "vector hash join"


def test_rrf_fuse_math(spark):
    # leg A ranks ids [1,2,3]; leg B ranks [3,2,4] — fused by hand
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "ida long, rank int")
    b = spark.createDataFrame([(3, 1), (2, 2), (4, 3)], "idb long, rank int")
    got = {r["id"]: r["rrf"] for r in
           rrf_fuse([(a, "ida"), (b, "idb")], k=10).collect()}
    want = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 62,
        3: 1 / 63 + 1 / 61,
        4: 1 / 63,
    }
    assert set(got) == set(want)
    for i, w in want.items():
        assert math.isclose(got[i], round(w, 6), abs_tol=1e-9)
    # k truncates by fused score desc: 1/63+1/61 = .032266 beats 2/62 = .032258
    top2 = [r["id"] for r in rrf_fuse([(a, "ida"), (b, "idb")], k=2).collect()]
    assert top2 == [3, 2]


def test_rrf_fuse_validation(spark):
    with pytest.raises(ValueError, match="at least one leg"):
        rrf_fuse([])
    df = spark.createDataFrame([(1, 1)], "id long, rank int")
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([(df, "id")], rrf_k=0)


def test_with_rank_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 1.0)], "id long, s double")
    ranked = with_rank(df, [F.desc("s"), F.asc("id")]).collect()
    by_id = {r["id"]: r["rank"] for r in ranked}
    assert by_id == {1: 1, 2: 2, 3: 3}


def test_hybrid_full_scan_shape(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    out = hybrid_search(d, "text", "doc_id", QUERY,
                        e, "embedding", "vec_id", QVEC, k=10).collect()
    assert len(out) == 10
    scores = [r["rrf"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= round(2 / 61, 6) + 1e-9 for s in scores)


def test_hybrid_indexed_matches_full_scan(spark, tmp_path, sf_dir):
    register_lance_datasource(spark)
    path = str(tmp_path / "docs")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    create_fts_index(spark, path, "text", "doc_id")

    e = load_table(spark, sf_dir, "embeddings")
    full = hybrid_search(d, "text", "doc_id", QUERY,
                         e, "embedding", "vec_id", QVEC, k=10).collect()
    idx = hybrid_search_indexed(spark, path, QUERY,
                                e, "embedding", "vec_id", QVEC, k=10).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in idx]


def test_rerank_topk(spark, sf_dir):
    from flink_connector_lance_spark.operators.retrieval import rerank_topk

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    cands = hybrid_search(d, "text", "doc_id", QUERY,
                          e, "embedding", "vec_id", QVEC, k=50)
    out = rerank_topk(cands, "id", d, "text", "doc_id", QUERY, k=10).collect()
    assert len(out) == 10
    scores = [r["rerank_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # rerank output comes from the candidate set only
    cand_ids = {r["id"] for r in cands.collect()}
    assert {r["doc_id"] for r in out} <= cand_ids
    # default proxy scorer: deterministic across runs
    again = rerank_topk(cands, "id", d, "text", "doc_id", QUERY, k=10).collect()
    assert [tuple(r) for r in out] == [tuple(r) for r in again]
    # custom scorer hook (cross-encoder stand-in): takes (texts, query)
    out2 = rerank_topk(cands, "id", d, "text", "doc_id", QUERY, k=5,
                       scorer=lambda texts, q: texts.str.len() * 1.0).collect()
    assert len(out2) == 5
    lens = [r["rerank_score"] for r in out2]
    assert lens == sorted(lens, reverse=True)


def test_knn_per_group_semantics(spark, sf_dir):
    from flink_connector_lance_spark.operators.knn import knn, knn_per_group

    e = load_table(spark, sf_dir, "embeddings")
    out = knn_per_group(e, "embedding", QVEC, "label", k=3, metric="l2",
                        tiebreak_cols=["vec_id"], round_digits=6)
    rows = out.collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append((r["_distance"], r["vec_id"]))
    # every group: <= 3 rows, and exactly the group-filtered global knn
    for lbl, got in by_label.items():
        want = [(r["_distance"], r["vec_id"]) for r in
                knn(e.filter(F.col("label") == lbl), "embedding", QVEC, k=3,
                    metric="l2", tiebreak_cols=["vec_id"],
                    round_digits=6).collect()]
        assert sorted(got) == sorted(want), f"label {lbl}"
    # all labels present
    assert set(by_label) == {r["label"] for r in e.select("label").distinct().collect()}
    with pytest.raises(ValueError):
        knn_per_group(e, "embedding", QVEC, "label", k=-1)
