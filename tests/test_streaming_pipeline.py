"""End-to-end streaming pipeline integration: file stream -> watermarked
streaming dedup -> exactly-once lance sink -> MVCC read-back.

Each component is unit-tested elsewhere; this pins that they COMPOSE —
the shape a real ingestion pipeline runs: dirty events arrive in
micro-batches, duplicates within the watermark horizon are dropped in
flight, every micro-batch commits one idempotent dataset version, and
the committed table is immediately queryable (including time travel)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.reader import read_dataset
from flink_connector_lance_spark.streaming.sink import stream_write_dataset
from flink_connector_lance_spark.streaming.windows import dedup_stream


def test_stream_dedup_into_lance_sink(spark, tmp_path):
    src = str(tmp_path / "incoming")
    out = str(tmp_path / "dataset")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # micro-batch 1: ids 0..9, each duplicated; batch 2: 5..14 (overlap
    # re-sends 5..9 — within the watermark horizon they must be dropped)
    rows1 = [(i, f"2024-01-01 00:00:{i:02d}") for i in range(10)] * 2
    rows2 = [(i, f"2024-01-01 00:01:{i - 4:02d}") for i in range(5, 15)]
    spark.createDataFrame(rows1, "id long, ts_s string").coalesce(1).write.mode(
        "overwrite").parquet(src + "/b1")

    stream = (
        spark.readStream.schema("id long, ts_s string").option(
            "maxFilesPerTrigger", "1").parquet(src + "/*")
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    )
    clean = dedup_stream(stream, ["id"], time_col="ts", watermark="10 minutes")
    q = stream_write_dataset(clean, out, ckpt, trigger_available_now=True)
    q.awaitTermination(120)

    got1 = {r.id for r in read_dataset(spark, out).select("id").collect()}
    assert got1 == set(range(10))  # in-batch duplicates dropped

    # second delivery: only genuinely-new ids land
    spark.createDataFrame(rows2, "id long, ts_s string").coalesce(1).write.mode(
        "overwrite").parquet(src + "/b2")
    q2 = stream_write_dataset(
        dedup_stream(
            spark.readStream.schema("id long, ts_s string").option(
                "maxFilesPerTrigger", "1").parquet(src + "/*")
            .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"),
            ["id"], time_col="ts", watermark="10 minutes"),
        out, ckpt, trigger_available_now=True)
    q2.awaitTermination(120)

    df = read_dataset(spark, out)
    assert {r.id for r in df.select("id").collect()} == set(range(15))
    assert df.count() == 15  # no duplicate rows committed, ever

    # every micro-batch committed exactly one MVCC version; time travel
    # to the first batch's version still shows only ids 0..9
    latest = FR.latest_version(out)
    assert latest >= 1
    v0 = read_dataset(spark, out, version=0)
    assert {r.id for r in v0.select("id").collect()} == set(range(10))
