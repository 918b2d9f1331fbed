"""Stateful streaming operator test: state must persist across micro-batches
(two availableNow runs over a file source sharing one checkpoint)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.streaming.stateful import running_counts


@pytest.fixture()
def events_dir(tmp_path, spark):
    d = str(tmp_path / "in")
    (
        spark.range(100)
        .select((F.col("id") % 4).alias("k"), F.col("id").cast("double").alias("v"))
        .write.mode("overwrite").parquet(d)
    )
    return d


def test_running_counts_accumulates_across_batches(spark, events_dir, tmp_path):
    schema = "k bigint, v double"
    out_rows = {}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (
            running_counts(stream, "k", "v")
            .writeStream.outputMode("update")
            .format("memory").queryName(f"rc_{len(out_rows)}")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r.key: (r.events, r.total_value) for r in
                spark.sql(f"SELECT * FROM rc_{len(out_rows)}").collect()}

    first = run_once()
    assert first["0"][0] == 25  # 100 ids, 4 keys
    assert first["1"][1] == sum(range(1, 100, 4))

    # second batch of data arrives; state must carry forward
    (
        spark.range(100, 140)
        .select((F.col("id") % 4).alias("k"), F.col("id").cast("double").alias("v"))
        .write.mode("append").parquet(events_dir)
    )
    out_rows["second"] = True
    second = run_once()
    assert second["0"][0] == 25 + 10
    assert second["2"][1] == sum(range(2, 100, 4)) + sum(range(102, 140, 4))
