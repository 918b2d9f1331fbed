"""Temporal-join queries over the events stream table.

Beyond-reference surface (SURVEY.md §7.1 M10): as-of join (event
attribution) and banded range join (co-occurrence mining) — the two
temporal primitives of training-data event pipelines. The DuckDB
oracles use the ANSI ``ASOF JOIN`` / a plain inequality join; the Spark
plans are the scale-safe reformulations (single-shuffle union+window,
banded equi-join — see operators/temporal.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import load_table
from ..operators.temporal import asof_join, range_join_pairs
from ..registry import register

_RANGE_WINDOW_US = 21_600 * 1_000_000  # 6 hours


@register(
    "events_asof_attribution",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of join: attribute each purchase to the latest prior-or-equal "
        "click by the same user (LEFT semantics — unattributed purchases "
        "keep NULLs). Spark plan is the union+window formulation: one "
        "shuffle on user_id, no range-predicate nested loop "
        "(operators.temporal.asof_join).",
)
def events_asof_attribution(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["click_id", "click_us"],
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        "click_id",
        (F.unix_micros("ts") - F.col("click_us")).alias("gap_us"),
    )


@register(
    "events_range_join",
    oracle=f"""
    SELECT a.user_id, count(*) AS n_pairs,
           round(avg((epoch_us(b.ts) - epoch_us(a.ts)) / 1000000.0), 4) AS avg_gap_s
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + {_RANGE_WINDOW_US}
    GROUP BY a.user_id
    """,
    doc="Range (interval) self-join: per user, count ordered event pairs "
        "within a 6-hour window and their mean gap. Spark plan bands "
        "timestamps into window-width buckets and equi-joins on "
        "(user, bucket) — candidates are in-band only, never the per-user "
        "cross product (operators.temporal.range_join_pairs).",
)
def events_range_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    pairs = range_join_pairs(
        e, key_col="user_id", ts_col="ts", id_col="event_id", window_us=_RANGE_WINDOW_US
    )
    return (
        pairs.groupBy(F.col("key").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg((F.col("us_b") - F.col("us_a")) / 1_000_000.0), 4).alias("avg_gap_s"),
        )
    )
