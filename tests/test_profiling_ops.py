"""Corpus-profiling operators: heavy-hitter tokens (oracle-checked without
consuming a driver registry slot) and the sketch variants of quantiles /
distinct counts that are deliberately NOT hash-comparable (approximate)
but must land near the exact answers."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.text import top_tokens

from .oracle_check import compare_spark_duckdb


def test_top_tokens_matches_oracle(spark, duck, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    out = top_tokens(d, "text", k=50)
    ok, msg = compare_spark_duckdb(
        out,
        duck,
        """
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) >= 1
        GROUP BY token
        ORDER BY cnt DESC, token
        LIMIT 50
        """,
    )
    assert ok, msg


def test_top_tokens_plan_is_partial_final_take_ordered(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    plan = top_tokens(d, "text", k=10)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2  # map-side combine before shuffle
    assert "TakeOrderedAndProject" in plan   # top-k, no global sort


def test_percentile_approx_tracks_exact(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    row = d.agg(
        F.percentile("n_chars", F.lit(0.5)).alias("exact"),
        F.percentile_approx("n_chars", F.lit(0.5), F.lit(10000)).alias("approx"),
    ).collect()[0]
    # t-digest at accuracy 10k should land within 2% of the exact median
    assert abs(row["approx"] - row["exact"]) <= max(0.02 * row["exact"], 1.0)


def test_approx_count_distinct_tracks_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", 0.01).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_repetition_signals_values_and_plan(spark):
    """Repetition filters: exact fractions on hand-computable docs, and
    the projection stays a shuffle-free codegen plan."""
    from flink_connector_lance_spark.operators.text import repetition_signals

    docs = spark.createDataFrame(
        [
            # 2-grams: [a b, b a, a b, b a, a b] -> 5 total, 2 distinct -> 0.6
            (1, "a b a b a b"),
            (2, "all unique words in this doc"),
            (3, "x\ny\nx\n\n  \nz"),  # lines x,y,x,z -> 1 - 3/4 = 0.25
            (4, "ab"),  # shorter than any n-gram -> 0.0
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in repetition_signals(docs, "text", "doc_id").collect()}
    assert out[1].repeated_2gram_frac == 0.6
    # 3-grams of doc 1: [a b a, b a b, a b a, b a b] -> 1 - 2/4 = 0.5
    assert out[1].repeated_3gram_frac == 0.5
    assert out[2].repeated_2gram_frac == 0.0
    assert out[3].repeated_line_frac == 0.25
    assert out[4].repeated_2gram_frac == 0.0 and out[4].repeated_3gram_frac == 0.0

    plan = repetition_signals(docs, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle projection
