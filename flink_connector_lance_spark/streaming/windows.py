"""Watermarked event-time windows for streams.

The reference has no event-time streaming at all (its source is a bounded
scan, ref table/LanceDynamicTableSource.java:143-145, and its sink only
buffers inserts, ref LanceSink.java:133-140) — this module is part of the
beyond-reference streaming surface, built entirely on Structured
Streaming primitives: ``withWatermark`` bounds state and defines the
late-data cutoff, ``F.window``/``F.session_window`` assign event-time
windows, and the aggregation itself is Spark's partial+final hash
aggregate over (window, keys).

Scale notes (100 TB / unbounded):

- State size is bounded by the watermark: closed windows are evicted, so
  executor state is O(open windows x keys), not O(stream history).
- The groupBy shuffles on (window, key) — the same key layout the batch
  ``events_tumbling_window`` query uses, so skew behavior and AQE
  handling carry over.
- In append output mode a window emits exactly once, when the watermark
  passes its end — the contract downstream epoch-idempotent sinks
  (streaming/sink.py) rely on for exactly-once file output.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _agg_exprs(value_col: str | None) -> list[Column]:
    out = [F.count(F.lit(1)).alias("events")]
    if value_col is not None:
        out.append(F.sum(value_col).alias("total_value"))
    return out


def windowed_counts(
    stream_df: DataFrame,
    time_col: str,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "2 minutes",
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) event-time window counts.

    Late rows — event time older than ``max(event time seen) -
    watermark`` — are dropped once their window has closed; that cutoff,
    not arrival order, defines the result. Works identically on batch
    DataFrames (watermark is a no-op there), which is how the oracle-
    gated ``events_tumbling_window`` query validates the same shape.
    """
    win = F.window(F.col(time_col), window, slide) if slide else F.window(F.col(time_col), window)
    wm = stream_df.withWatermark(time_col, watermark)
    return (
        wm.groupBy(win.alias("win"), *[F.col(k) for k in keys])
        .agg(*_agg_exprs(value_col))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "events",
            *(["total_value"] if value_col is not None else []),
        )
    )


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked stream-stream interval join: pairs where
    ``right_ts - left_ts`` lies in ``[lower_s, upper_s]`` seconds — the
    streaming counterpart of the batch ``temporal.range_join_pairs`` (and
    of Flink's interval join, the shape the reference's host runtime
    executes for delegated stream SQL).

    Both sides carry watermarks and the join predicate bounds event time
    in BOTH directions, which is exactly what Structured Streaming needs
    to evict state: a buffered left row can be dropped once the watermark
    passes ``left_ts + upper_s``. Without the bounds the join would
    buffer both streams forever. Works identically on batch frames
    (watermarks are no-ops there).

    Column names must be disjoint apart from ``on`` (pre-alias a side).
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    lt, rt = F.col(left_ts), F.col(right_ts)
    cond = (
        (l_wm[on] == r_wm[on])
        & (rt >= lt + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (rt <= lt + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l_wm.join(r_wm, cond, "inner").drop(r_wm[on])


def dedup_stream(
    stream_df: DataFrame,
    keys: Sequence[str],
    time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication — the stream counterpart of the batch
    ``dedup.exact_dedup`` (same keys-define-identity semantics).

    With ``time_col`` set, uses ``dropDuplicatesWithinWatermark``: state
    for a key is evicted once the watermark passes its event time +
    watermark delay, so executor state is bounded by the watermark horizon
    — the ONLY formulation that survives an unbounded stream. Duplicates
    arriving within the horizon are dropped; later ones are by definition
    late data. Without ``time_col`` plain ``dropDuplicates`` keeps state
    forever (exact, but unbounded — batch or short streams only).
    """
    if time_col is None:
        return stream_df.dropDuplicates(list(keys))
    wm = stream_df.withWatermark(time_col, watermark)
    return wm.dropDuplicatesWithinWatermark(list(keys))


def session_windows(
    stream_df: DataFrame,
    time_col: str,
    gap: str = "5 minutes",
    watermark: str = "2 minutes",
    keys: Sequence[str] = (),
    value_col: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge into one
    window per key group. A session closes (and, in streams, emits) when
    the watermark passes its end + gap. The dynamic merge is Spark's
    built-in ``session_window`` state operator; the batch
    ``events_sessionize`` query pins equivalent lag/cumsum semantics
    against the DuckDB oracle."""
    wm = stream_df.withWatermark(time_col, watermark)
    return (
        wm.groupBy(F.session_window(F.col(time_col), gap).alias("win"),
                   *[F.col(k) for k in keys])
        .agg(*_agg_exprs(value_col))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "events",
            *(["total_value"] if value_col is not None else []),
        )
    )
