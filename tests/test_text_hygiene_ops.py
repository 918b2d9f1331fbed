"""Unit tests for the corpus text-hygiene operators: line-level dedup
(boilerplate removal), sliding-window chunking, and the per-key cap —
hand-built frames with known answers plus the determinism/equivalence
properties the operators promise."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from flink_connector_lance_spark.operators.sampling import cap_per_key
from flink_connector_lance_spark.operators.text import chunk_documents, line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_removes_cross_doc_boilerplate_only(spark):
    d = _docs(spark, [
        (1, "hello world\nboiler\nunique a"),
        (2, "boiler\nunique b"),
        (3, "boiler\n  \n"),
        (4, "pair\nunique d"),
        (5, "pair\nunique e"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(d, "text", "doc_id", max_doc_freq=2).collect()}
    assert len(out) == 5
    # "boiler" appears in 3 distinct docs > 2 -> removed everywhere
    assert (out[1]["n_lines"], out[1]["n_kept_lines"]) == (3, 2)
    assert out[1]["cleaned"] == "hello world\nunique a"
    assert out[2]["cleaned"] == "unique b"
    # doc 3: blank lines dropped from the count, its only real line removed
    assert (out[3]["n_lines"], out[3]["n_kept_lines"], out[3]["cleaned"]) == (1, 0, "")
    # "pair" is in exactly max_doc_freq docs -> kept (boundary is inclusive)
    assert out[4]["cleaned"] == "pair\nunique d"
    assert out[5]["cleaned"] == "pair\nunique e"


def test_line_dedup_within_doc_repeats_survive_in_order(spark):
    # doc-frequency counts DISTINCT documents: a line repeated inside one
    # document has df=1 and every occurrence survives, original order kept
    d = _docs(spark, [(1, "rep\nzz\nrep\naa")])
    row = line_dedup(d, "text", "doc_id", max_doc_freq=1).collect()[0]
    assert (row["n_lines"], row["n_kept_lines"]) == (4, 4)
    assert row["cleaned"] == "rep\nzz\nrep\naa"


def test_line_dedup_trims_key_but_preserves_line_text(spark):
    # "  boiler " and "boiler" are the same dedup key (trimmed) but kept
    # lines reassemble with their original whitespace
    d = _docs(spark, [
        (1, "  keepme \nx"),
        (2, "other\ny"),
    ])
    out = {r["doc_id"]: r for r in line_dedup(d, "text", "doc_id", max_doc_freq=2).collect()}
    assert out[1]["cleaned"] == "  keepme \nx"


def test_line_dedup_plan_has_no_nested_loop(spark):
    d = _docs(spark, [(1, "a\nb"), (2, "b\nc")])
    plan = line_dedup(d, "text", "doc_id", max_doc_freq=1)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_boundaries_and_truncation(spark):
    d = _docs(spark, [(1, "a b c d e f g")])  # 7 tokens
    rows = sorted(chunk_documents(d, "text", "doc_id", chunk_tokens=3, stride=2).collect(),
                  key=lambda r: r["chunk_idx"])
    # starts 1, 3, 5, 7 -> [a b c], [c d e], [e f g], [g]
    assert [r["start_token"] for r in rows] == [1, 3, 5, 7]
    assert [r["n_chunk_tokens"] for r in rows] == [3, 3, 3, 1]
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_hash"] == hashlib.md5(b"a b c").hexdigest()
    assert rows[1]["chunk_hash"] == hashlib.md5(b"c d e").hexdigest()
    assert rows[3]["chunk_hash"] == hashlib.md5(b"g").hexdigest()


def test_chunk_documents_short_and_empty_docs_yield_one_chunk(spark):
    d = _docs(spark, [(1, "x y"), (2, "")])
    rows = chunk_documents(d, "text", "doc_id", chunk_tokens=5, stride=5).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 2
    assert by_id[1]["chunk_hash"] == hashlib.md5(b"x y").hexdigest()
    assert by_id[2]["n_chunk_tokens"] == 1  # split("") -> [""]


def test_chunk_documents_rejects_bad_params(spark):
    d = _docs(spark, [(1, "x")])
    for kw in ({"chunk_tokens": 0}, {"stride": 0}, {"chunk_tokens": -1}):
        try:
            chunk_documents(d, "text", "doc_id", **kw)
            raise AssertionError(f"expected ValueError for {kw}")
        except ValueError:
            pass


def _keyed(spark, n=40, keys=("a", "b")):
    rows = [(i, keys[i % len(keys)]) for i in range(n)]
    return spark.createDataFrame(rows, "id long, k string")


def test_cap_per_key_keeps_cap_rows_per_key(spark):
    out = cap_per_key(_keyed(spark), "k", "id", cap=5)
    counts = {r["k"]: r["c"] for r in out.groupBy("k").agg(F.count("*").alias("c")).collect()}
    assert counts == {"a": 5, "b": 5}


def test_cap_per_key_matches_reference_md5_priority(spark):
    # survivors are exactly the cap lowest md5(id || ':cap') of each key
    df = _keyed(spark, n=20)
    got = {r["id"] for r in cap_per_key(df, "k", "id", cap=3).collect()}
    expected = set()
    for key_mod in (0, 1):
        ids = [i for i in range(20) if i % 2 == key_mod]
        ids.sort(key=lambda i: (hashlib.md5(f"{i}:cap".encode()).hexdigest(), i))
        expected.update(ids[:3])
    assert got == expected


def test_cap_per_key_two_stage_skew_path_is_identical(spark):
    df = _keyed(spark, n=100, keys=("hot", "hot", "hot", "cold"))
    one = {r["id"] for r in cap_per_key(df, "k", "id", cap=7).collect()}
    two = {r["id"] for r in cap_per_key(df, "k", "id", cap=7, skew_buckets=5).collect()}
    assert one == two


def test_cap_per_key_cap_above_group_size_keeps_all(spark):
    df = _keyed(spark, n=10)
    assert cap_per_key(df, "k", "id", cap=99).count() == 10


def test_cap_per_key_rejects_bad_params(spark):
    df = _keyed(spark, n=4)
    for kw in ({"cap": 0}, {"cap": 2, "skew_buckets": 0}):
        try:
            cap_per_key(df, "k", "id", **kw)
            raise AssertionError(f"expected ValueError for {kw}")
        except ValueError:
            pass


def test_line_dedup_keeps_empty_and_null_docs(spark):
    # docs with no non-empty lines must still return their row (a caller
    # joining cleaned text back would otherwise silently lose them)
    d = spark.createDataFrame(
        [(1, "hello\nworld"), (2, ""), (3, "  \n "), (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_dedup(d, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3, 4}
    for i in (2, 3, 4):
        assert (out[i]["n_lines"], out[i]["n_kept_lines"], out[i]["cleaned"]) == (0, 0, "")
    assert out[1]["cleaned"] == "hello\nworld"


def test_line_dedup_separator_is_literal(spark):
    # '|' is a regex metachar; the separator must be treated literally
    d = spark.createDataFrame([(1, "alpha|beta"), (2, "beta|gamma")],
                              "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(d, "text", "doc_id", max_doc_freq=1, line_sep="|").collect()}
    assert out[1]["cleaned"] == "alpha"  # 'beta' in 2 docs -> removed
    assert out[2]["cleaned"] == "gamma"
    assert out[1]["n_lines"] == 2
