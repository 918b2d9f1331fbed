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
