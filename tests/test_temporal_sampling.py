"""Unit tests for the temporal joins and the hash split — hand-built
frames with known answers (ties, no-match rows, window edges), plus the
stickiness/portability properties the operators promise."""

from __future__ import annotations

import datetime as dt
import hashlib

import pyspark.sql.functions as F

from flink_connector_lance_spark.operators.knn import knn, knn_join
from flink_connector_lance_spark.operators.sampling import hash_bucket, stratified_split
from flink_connector_lance_spark.operators.temporal import asof_join, range_join_pairs


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_prior_and_nulls_unmatched(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p1"),
         (1, _ts("2024-01-01 12:00:00"), "p2"),
         (2, _ts("2024-01-01 09:00:00"), "p3")],  # no click for user 2
        "user int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 100),
         (1, _ts("2024-01-01 11:59:59"), 101),
         (1, _ts("2024-01-01 13:00:00"), 102)],  # after every purchase
        "user int, ts timestamp, click_id int",
    )
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_cols=["click_id"])
    got = {r["pid"]: r["click_id"] for r in out.collect()}
    assert got == {"p1": 100, "p2": 101, "p3": None}


def test_asof_join_exact_timestamp_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p")], "user int, ts timestamp, pid string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7)], "user int, ts timestamp, click_id int")
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_cols=["click_id"])
    assert out.collect()[0]["click_id"] == 7


def test_asof_join_forward_picks_earliest_following(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "p1"),
         (1, _ts("2024-01-01 14:00:00"), "p2")],  # nothing after -> NULL
        "user int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1),     # before p1: ignored forward
         (1, _ts("2024-01-01 10:30:00"), 2),
         (1, _ts("2024-01-01 11:00:00"), 3)],
        "user int, ts timestamp, click_id int",
    )
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_cols=["click_id"], direction="forward")
    got = {r["pid"]: r["click_id"] for r in out.collect()}
    assert got == {"p1": 2, "p2": None}


def test_asof_join_tolerance_nulls_distant_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "near"),
         (1, _ts("2024-01-01 20:00:00"), "far")],
        "user int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:59:00"), 5)],
        "user int, ts timestamp, click_id int",
    )
    out = asof_join(left, right, on=["user"], left_ts="ts", right_ts="ts",
                    right_cols=["click_id"], tolerance_us=3600 * 1_000_000)
    got = {r["pid"]: r["click_id"] for r in out.collect()}
    assert got == {"near": 5, "far": None}  # 10h gap exceeds the 1h tolerance


def test_asof_join_rejects_bad_direction(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"), 0)],
                               "user int, ts timestamp, x int")
    try:
        asof_join(df, df.select("user", "ts", F.col("x").alias("y")),
                  on=["user"], left_ts="ts", right_ts="ts",
                  right_cols=["y"], direction="nearest")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "direction" in str(e)


def test_asof_join_rejects_column_clash(spark):
    df = spark.createDataFrame([(1, _ts("2024-01-01 00:00:00"))], "user int, ts timestamp")
    try:
        asof_join(df, df, on=["user"], left_ts="ts", right_ts="ts", right_cols=["ts"])
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "clash" in str(e)


def test_range_join_window_edges(spark):
    base = _ts("2024-01-01 00:00:00")
    rows = [(1, base, 0),
            (1, base + dt.timedelta(seconds=60), 1),    # exactly at window edge
            (1, base + dt.timedelta(seconds=61), 2),    # outside from id 0
            (2, base + dt.timedelta(seconds=30), 3)]    # other key
    df = spark.createDataFrame(rows, "user int, ts timestamp, id int")
    pairs = range_join_pairs(df, "user", "ts", "id", window_us=60_000_000)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # (0,1): gap=60s inclusive; (1,2): gap=1s; (0,2): 61s excluded; key 2 alone
    assert got == {(0, 1), (1, 2)}


def test_hash_bucket_matches_reference_md5(spark):
    # portability contract: bucket == int(md5(f"{id}:split")[:12], 16) % 10
    # (48 bits: modulo bias ~n/2^48, vs 7% relative inflation at 16 bits)
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    got = {r["doc_id"]: r["b"] for r in
           df.select("doc_id", hash_bucket("doc_id", 10).alias("b")).collect()}
    for i in range(200):
        expect = int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:12], 16) % 10
        assert got[i] == expect


def test_hash_bucket_large_resolution_not_degenerate(spark):
    # 16-bit buckets made any resolution > 65536 keep everything; 48 bits
    # must spread across the full range
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    res = 1_000_000
    vals = [r["b"] for r in df.select(hash_bucket("doc_id", res).alias("b")).collect()]
    assert max(vals) > 65536  # actually uses the range beyond 16 bits
    # rate 0.1 keeps ~10%, not 100%
    kept = sum(1 for v in vals if v < res * 0.1)
    assert 0.05 < kept / len(vals) < 0.15


def test_stratified_split_weights_and_stickiness(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = stratified_split(df, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 5000 < 0.85
    assert 0.07 < counts["val"] / 5000 < 0.13
    assert 0.07 < counts["test"] / 5000 < 0.13
    # appending rows never moves existing ids between splits
    bigger = stratified_split(
        spark.createDataFrame([(i,) for i in range(10000)], "doc_id long"), "doc_id")
    small = {r["doc_id"]: r["split"] for r in out.collect()}
    big = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(big[i] == small[i] for i in range(5000))


def test_knn_join_matches_per_query_knn(spark):
    import math
    corpus = spark.createDataFrame(
        [(i, [math.sin(i + j) for j in range(8)]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [0.1] * 8), (200, [0.9] * 8)],
        "query_id long, embedding array<double>",
    )
    joined = knn_join(corpus, queries, "embedding", k=5, metric="l2")
    by_q = {}
    for r in joined.collect():
        by_q.setdefault(r["query_id"], []).append((r["_distance"], r["vec_id"]))
    assert set(by_q) == {100, 200}
    for qid, qvec in [(100, [0.1] * 8), (200, [0.9] * 8)]:
        single = knn(corpus, "embedding", qvec, k=5, metric="l2",
                     tiebreak_cols=["vec_id"], round_digits=6)
        expect = [(r["_distance"], r["vec_id"]) for r in single.collect()]
        assert sorted(by_q[qid]) == sorted(expect), f"query {qid}"


def test_pack_bins_contiguous_semantics(spark):
    from flink_connector_lance_spark.operators.packing import pack_bins, pack_stats

    # single shard (n_shards=1): packing order is plain id order
    d = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id long, n_tok long")
    packed = pack_bins(d, "doc_id", "n_tok", budget=250, n_shards=1)
    rows = {r.doc_id: r.bin for r in packed.collect()}
    # cumsum-exclusive / 250: docs 0,1,2 -> bin 0 (0,100,200), 3,4 -> bin 1
    # (300,400), 5,6,7 -> bin 2 (500,600,700), 8,9 -> bin 3
    assert rows == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 2, 8: 3, 9: 3}

    stats = pack_stats(d, "doc_id", "n_tok", budget=250, n_shards=1)
    by_bin = {r.bin: r for r in stats.collect()}
    assert by_bin[0].n_docs == 3 and by_bin[0].bin_tokens == 300
    assert by_bin[0].first_id == 0 and by_bin[0].last_id == 2
    # every doc lands in exactly one bin
    assert sum(r.n_docs for r in by_bin.values()) == 10


def test_pack_bins_shards_are_deterministic_and_bounded(spark):
    from flink_connector_lance_spark.operators.packing import pack_bins

    d = spark.createDataFrame([(i, 10) for i in range(500)], "doc_id long, n_tok long")
    a = {(r.doc_id): (r.shard, r.bin) for r in
         pack_bins(d, "doc_id", "n_tok", budget=100, n_shards=8).collect()}
    b = {(r.doc_id): (r.shard, r.bin) for r in
         pack_bins(d, "doc_id", "n_tok", budget=100, n_shards=8).collect()}
    assert a == b  # deterministic
    assert all(0 <= s < 8 for s, _ in a.values())
    # appending documents never reassigns existing ids to other shards
    bigger = spark.createDataFrame([(i, 10) for i in range(1000)],
                                   "doc_id long, n_tok long")
    c = {r.doc_id: r.shard for r in
         pack_bins(bigger, "doc_id", "n_tok", budget=100, n_shards=8).collect()}
    assert all(c[i] == a[i][0] for i in range(500))


def test_sample_mixture_deterministic_sticky_and_rate_bounded(spark, sf_dir):
    """Mixture sampling: reproducible row-wise, sticky under appends,
    rate 1.0 keeps everything, rate 0.0 drops everything, and kept
    fractions land near the requested rates."""
    import pyspark.sql.functions as F
    import pytest

    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.sampling import sample_mixture

    d = load_table(spark, sf_dir, "documents")
    rates = {"en": 0.5, "de": 1.0, "fr": 0.0}
    kept1 = {r.doc_id for r in sample_mixture(d, "doc_id", rates, "lang").collect()}
    kept2 = {r.doc_id for r in sample_mixture(d, "doc_id", rates, "lang").collect()}
    assert kept1 == kept2  # deterministic

    by_lang = {r.lang: r.cnt for r in
               sample_mixture(d, "doc_id", rates, "lang")
               .groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    total = {r.lang: r.cnt for r in
             d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert by_lang.get("de", 0) == total["de"]       # rate 1.0: all kept
    assert "fr" not in by_lang                       # rate 0.0: none kept
    assert by_lang.get("en", 0) < total["en"]        # rate 0.5: strict subset
    # default_rate=0: unlisted languages dropped entirely
    assert set(by_lang) <= set(rates)

    # sticky: membership decided row-wise, so sampling a superset keeps
    # exactly the same original rows
    extra = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    sup = {r.doc_id for r in
           sample_mixture(d.unionByName(extra), "doc_id", rates, "lang").collect()}
    assert kept1 == {i for i in sup if i < 1_000_000}

    with pytest.raises(ValueError, match="rate"):
        sample_mixture(d, "doc_id", {"en": 1.5}, "lang")
