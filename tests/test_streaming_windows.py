"""Watermarked window semantics over a real stream: late data beyond the
watermark is dropped, closed windows emit exactly once (append mode), and
open windows stay unemitted.

Two availableNow runs share one checkpoint (same harness as the stateful
test): run 1 establishes the watermark, run 2 delivers a late row plus
new on-time rows and must (a) drop the late row from its closed window,
(b) emit the next window once the watermark passes it, (c) hold back the
still-open window.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.streaming.windows import session_windows, windowed_counts


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 10, minute, second)


@pytest.fixture()
def stream_dirs(tmp_path, spark):
    d = str(tmp_path / "in")
    (
        spark.createDataFrame(
            [("a", _ts(1)), ("a", _ts(2)), ("b", _ts(3)), ("a", _ts(8))],
            "k string, ts timestamp",
        ).write.mode("overwrite").parquet(d)
    )
    return d, str(tmp_path / "ckpt")


def _run(spark, src_dir, ckpt, emitted):
    def fold(batch_df, epoch_id):
        emitted.extend(
            (r.window_start.minute, r.window_end.minute, r.k, r.events)
            for r in batch_df.collect()
        )

    stream = spark.readStream.schema("k string, ts timestamp").parquet(src_dir)
    q = (
        windowed_counts(stream, "ts", window="5 minutes", watermark="2 minutes", keys=["k"])
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_late_data_dropped_and_windows_emit_once(spark, stream_dirs):
    src, ckpt = stream_dirs
    emitted: list = []
    # run 1: max event time 10:08 -> watermark 10:06 at run end; the
    # [10:00,10:05) window may emit here or at the start of run 2
    _run(spark, src, ckpt, emitted)

    # run 2 delivers: a LATE row (10:04 < watermark 10:06, its window is
    # closed -> must be dropped), an on-time row for the open [10:05,10:10)
    # window, and a fresh row at 10:20 that advances the watermark to
    # 10:18, closing [10:05,10:10)
    (
        spark.createDataFrame(
            [("a", _ts(4)), ("b", _ts(7)), ("a", _ts(20))],
            "k string, ts timestamp",
        ).write.mode("append").parquet(src)
    )
    _run(spark, src, ckpt, emitted)

    results = {(w0, w1, k): n for (w0, w1, k, n) in emitted}
    # each closed window emitted exactly once across both runs
    assert len(emitted) == len(results)
    # late 10:04 row NOT counted: window [10:00,10:05) keeps a=2
    assert results[(0, 5, "a")] == 2
    assert results[(0, 5, "b")] == 1
    # [10:05,10:10): the on-time 10:07 row IS counted alongside run 1's 10:08
    assert results[(5, 10, "a")] == 1
    assert results[(5, 10, "b")] == 1
    # [10:20,10:25) is still open (watermark 10:18) -> not emitted
    assert (20, 25, "a") not in results


def test_dedup_stream_drops_duplicates_within_watermark(spark, tmp_path):
    from flink_connector_lance_spark.streaming.windows import dedup_stream

    src = str(tmp_path / "in")
    (
        spark.createDataFrame(
            [(1, _ts(1)), (1, _ts(2)), (2, _ts(2)), (1, _ts(3)), (3, _ts(4))],
            "id long, ts timestamp",
        ).write.mode("overwrite").parquet(src)
    )
    seen: list = []

    def fold(batch_df, epoch_id):
        seen.extend(r.id for r in batch_df.collect())

    stream = spark.readStream.schema("id long, ts timestamp").parquet(src)
    q = (
        dedup_stream(stream, keys=["id"], time_col="ts", watermark="10 minutes")
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # duplicates of id=1 inside the watermark horizon collapse to one row
    assert sorted(seen) == [1, 2, 3]


def test_interval_join_stream_pairs_within_bounds(spark, tmp_path):
    from flink_connector_lance_spark.streaming.windows import interval_join_stream

    clicks = str(tmp_path / "clicks")
    buys = str(tmp_path / "buys")
    (
        spark.createDataFrame(
            [(1, _ts(0), 100), (1, _ts(9), 101), (2, _ts(0), 102)],
            "user long, cts timestamp, click long",
        ).write.mode("overwrite").parquet(clicks)
    )
    (
        spark.createDataFrame(
            # u1 10:05 pairs with click 100 (gap 5m, within [0,8m]);
            # click 101 is AFTER the purchase (gap -4m, excluded);
            # u2 10:30 is 30m after click 102 (beyond upper bound)
            [(1, _ts(5), 200), (2, _ts(30), 201)],
            "user long, bts timestamp, buy long",
        ).write.mode("overwrite").parquet(buys)
    )
    got: list = []

    def fold(batch_df, epoch_id):
        got.extend((r.click, r.buy) for r in batch_df.collect())

    cs = spark.readStream.schema("user long, cts timestamp, click long").parquet(clicks)
    bs = spark.readStream.schema("user long, bts timestamp, buy long").parquet(buys)
    q = (
        interval_join_stream(cs, bs, on="user", left_ts="cts", right_ts="bts",
                             lower_s=0, upper_s=480)
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sorted(got) == [(100, 200)]


def test_interval_join_batch_mode_same_semantics(spark):
    from flink_connector_lance_spark.streaming.windows import interval_join_stream

    l = spark.createDataFrame([(1, _ts(0), 10)], "user long, cts timestamp, click long")
    r = spark.createDataFrame(
        [(1, _ts(3), 20), (1, _ts(20), 21)], "user long, bts timestamp, buy long")
    out = interval_join_stream(l, r, on="user", left_ts="cts", right_ts="bts",
                               lower_s=0, upper_s=300)
    assert [(x.click, x.buy) for x in out.collect()] == [(10, 20)]


def test_dedup_stream_batch_mode_without_time_col(spark):
    from flink_connector_lance_spark.streaming.windows import dedup_stream

    df = spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "id long, v string")
    assert dedup_stream(df, keys=["id"]).count() == 2


def test_session_windows_merge_within_gap(spark):
    # batch-mode semantics of the same helper: rows <= gap apart merge;
    # a > gap silence splits the session
    df = spark.createDataFrame(
        [("u1", _ts(0)), ("u1", _ts(2)), ("u1", _ts(3)),
         ("u1", _ts(30)), ("u2", _ts(1))],
        "k string, ts timestamp",
    )
    out = {
        (r.k, r.window_start.minute): r.events
        for r in session_windows(df, "ts", gap="5 minutes", keys=["k"]).collect()
    }
    assert out == {("u1", 0): 3, ("u1", 30): 1, ("u2", 1): 1}
