"""Temporal join operators: as-of join and banded range join.

Beyond-reference operators (SURVEY.md §7.1 M10): the reference connector
has no temporal-join surface; these are the standard building blocks of
event attribution ("which click preceded this purchase") and
feature-backfill pipelines over event streams.

Scale design:

- ``asof_join`` uses the union+window formulation: both sides are
  unioned and sorted ONCE per key — a single shuffle on the join key,
  the same physical shape as any windowed aggregation (and therefore
  AQE-skew-splittable). The naive formulation — a range-predicate join
  ``l.ts >= r.ts`` followed by a max — is a broadcast nested loop over
  the time dimension that explodes as O(|left| * |right per key|);
  Catalyst cannot equi-join on an inequality, so we never hand it one.
  ``last(..., ignorenulls=True)`` over the interleaved timeline carries
  the most recent right-side payload forward onto each left row.

- ``range_join_pairs`` bands event times into window-width buckets and
  equi-joins on (key, bucket), replicating the LEFT side into its own
  and the following bucket. Any pair within ``window`` shares one of
  those two bucket keys, so candidates are exactly the in-band pairs —
  never the O(n² per key) cross product. Join input is a skinny
  (key, id, ts_us) projection; payloads can be re-joined by id after
  the band filter when needed.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """As-of join: each left row gains the values of ``right_cols`` from
    the nearest right row with the same ``on`` keys — the latest with
    ``right_ts <= left_ts`` (``direction="backward"``, the default,
    matching ANSI/DuckDB ``ASOF LEFT JOIN``) or the earliest with
    ``right_ts >= left_ts`` (``direction="forward"``). NULLs when no such
    row exists (LEFT semantics). ``tolerance_us`` additionally nulls out
    matches farther than that many microseconds from the left timestamp
    (pandas ``merge_asof`` tolerance semantics).

    ``right_cols`` must not clash with left column names (pre-alias the
    right side). Ties on the timestamp are resolved right-before-left
    (equal timestamps match); among equal right timestamps the first of
    ``right_cols`` breaks the tie deterministically.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    on = list(on)
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols clash with left columns: {sorted(clash)}")
    payload = [c for c in left.columns if c not in on]
    carry = list(right_cols)
    l_side = left.select(
        *on,
        *payload,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in carry],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
    )
    r_side = right.select(
        *on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *carry,
        F.col(right_ts).alias("__r_ts"),
    )
    # One shuffle: repartition+sort by key over the interleaved timeline.
    # backward walks time ascending, forward descending; either way right
    # rows sort before left rows at equal timestamps (__is_left asc) so an
    # exact-timestamp right row is visible to its left row.
    ts_order = F.asc("__ts") if direction == "backward" else F.desc("__ts")
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.asc("__is_left"), F.asc(carry[0]))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill = [*carry, "__r_ts"]
    filled = l_side.unionByName(r_side).select(
        *on,
        *payload,
        "__ts",
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill],
    )
    out = filled.filter(F.col("__is_left") == 1)
    if tolerance_us is not None:
        within = (
            F.abs(F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__r_ts")))
            <= F.lit(tolerance_us)
        )
        out = out.select(
            *on,
            *payload,
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c) for c in carry],
        )
    else:
        out = out.select(*on, *payload, *carry)
    return out


def range_join_pairs(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    window_us: int,
) -> DataFrame:
    """Ordered pairs (a, b) of rows sharing ``key_col`` with
    ``ts(a) < ts(b) <= ts(a) + window_us`` (microsecond precision).

    Returns a skinny DataFrame ``(key, id_a, id_b, us_a, us_b)``.
    Banded equi-join: left rows are replicated into their own and the
    next window-width bucket; every in-window pair shares one of those
    bucket keys, so the join is an equi-join on (key, bucket) with a
    residual time filter — candidate count is O(in-band pairs).
    """
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    skinny = df.select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    bucket = F.floor(F.col("us") / F.lit(window_us))
    a = skinny.select(
        "key",
        F.col("id").alias("id_a"),
        F.col("us").alias("us_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = skinny.select(
        "key",
        F.col("id").alias("id_b"),
        F.col("us").alias("us_b"),
        bucket.alias("bucket"),
    )
    return (
        a.join(b, on=["key", "bucket"])
        .filter((F.col("us_b") > F.col("us_a")) & (F.col("us_b") <= F.col("us_a") + window_us))
        .select("key", "id_a", "id_b", "us_a", "us_b")
    )
