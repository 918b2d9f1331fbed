"""Extended surface: aggregate fast paths, beyond-reference OLAP shapes,
regex tokenization.

- count-star metadata fast path: the reference reads fragment row counts
  without scanning data (ref LanceInputFormat.java:117); our manifest
  carries per-fragment row counts, so COUNT(*) is a driver-side
  metadata sum — at 100 TB this answers in milliseconds vs a full scan.
- grouping sets / rollup: the reference REJECTS multiple grouping sets
  (ref table/LanceDynamicTableSource.java:406-408); Spark executes them
  natively engine-side — a strict capability superset.
- BPE-ish regex tokenization: token counting on a regex alphabet rather
  than whitespace (training-data pipeline op).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


# (The COUNT(*)-from-manifest-metadata fast path is gated inside the
# merged `source_version_travel` query — its v1_meta row must hash-match
# the scan count of the same version.)


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price,
           count(DISTINCT l_partkey) AS exact_parts
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets — beyond the reference, which rejects >1 "
        "grouping set (ref table/LanceDynamicTableSource.java:406-408); "
        "Spark expands grouping sets inside the partial aggregate. Includes "
        "exact COUNT DISTINCT per grouping set (ref AggregateExecutor "
        "HashSet path :115-123); the 100 TB variant "
        "approx_count_distinct(HLL) is asserted separately in tests (not "
        "hash-comparable by design).",
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@register(
    "doc_length_quantiles",
    oracle="""
    SELECT lang,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    doc="Exact interpolated percentiles of document length per language — "
        "the corpus-profiling aggregate every training-data pipeline runs "
        "before setting length filters. Spark `percentile` matches DuckDB "
        "quantile_cont (linear interpolation). The 100 TB path is "
        "percentile_approx (t-digest sketch, mergeable map-side) — asserted "
        "separately in tests, not hash-comparable by design.",
)
def doc_length_quantiles(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 4).alias("p99"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# (BPE-ish regex tokenization lives in the merged `text_stats` query —
# one pass over the corpus computes the whole per-document text profile.)
