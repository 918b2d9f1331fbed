"""BM25 retrieval scoring (operators/text.py): scores verified against a
pure-Python reference; top-k ordering and determinism pinned."""

from __future__ import annotations

import math

import pytest

from flink_connector_lance_spark.operators.text import (
    BM25_B,
    BM25_K1,
    bm25_search,
)

DOCS = [
    (0, "hash join hash join fast"),
    (1, "vector scan slow merge line"),
    (2, "join vector vector hash batch sort key"),
    (3, "table row column filter scan"),
    (4, "hash"),
]


def _py_bm25(query_terms, k1=BM25_K1, b=BM25_B):
    toks = {i: t.split(" ") for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, ts in toks.items():
        dl = len(ts)
        s = 0.0
        for t in query_terms:
            df = sum(1 for v in toks.values() if t in v)
            tf = float(ts.count(t))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
        out[i] = round(s, 6)
    return out


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_scores_match_python_reference(spark, corpus):
    got = {r.doc_id: r.bm25 for r in bm25_search(corpus, "text", "doc_id",
                                                 "vector hash join", k=5).collect()}
    exp = _py_bm25(["vector", "hash", "join"])
    assert got.keys() == exp.keys()
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=1e-6)


def test_topk_order_is_score_desc_then_id(spark, corpus):
    rows = bm25_search(corpus, "text", "doc_id", "vector hash join", k=3).collect()
    exp = sorted(_py_bm25(["vector", "hash", "join"]).items(),
                 key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r.doc_id, r.bm25) for r in rows] == [
        (i, pytest.approx(s, abs=1e-6)) for i, s in exp
    ]


def test_absent_term_contributes_zero_everywhere(spark, corpus):
    with_ghost = {r.doc_id: r.bm25 for r in bm25_search(
        corpus, "text", "doc_id", "hash zzz_unseen", k=5).collect()}
    only_hash = {r.doc_id: r.bm25 for r in bm25_search(
        corpus, "text", "doc_id", "hash", k=5).collect()}
    assert with_ghost == only_hash  # tf=0 kills the unseen term's contribution


def test_repeated_query_terms_dedupe(spark, corpus):
    once = {r.doc_id: r.bm25 for r in bm25_search(
        corpus, "text", "doc_id", "hash", k=5).collect()}
    thrice = {r.doc_id: r.bm25 for r in bm25_search(
        corpus, "text", "doc_id", "hash hash hash", k=5).collect()}
    assert once == thrice


def test_empty_query_rejected(spark, corpus):
    with pytest.raises(ValueError, match="empty query"):
        bm25_search(corpus, "text", "doc_id", "  ", k=3)
