"""Stateful streaming operator test: state must persist across micro-batches
(two availableNow runs over a file source sharing one checkpoint).

The second run *recovers* from the first run's checkpoint; Spark's memory
sink refuses checkpoint recovery ("This query does not support recovering
from checkpoint location"), so the collector is a foreachBatch sink — the
batch function runs on the driver and folds updated rows into a dict.
"""

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

    def run_once():
        latest = {}

        def fold(batch_df, epoch_id):
            for r in batch_df.collect():
                latest[r.key] = (r.events, r.total_value)

        stream = spark.readStream.schema(schema).parquet(events_dir)
        q = (
            running_counts(stream, "k", "v")
            .writeStream.outputMode("update")
            .foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return latest

    first = run_once()
    assert first["0"][0] == 25  # 100 ids, 4 keys
    assert first["1"][1] == sum(range(1, 100, 4))

    # second batch of data arrives; state must carry forward across the
    # checkpoint-recovered restart
    (
        spark.range(100, 140)
        .select((F.col("id") % 4).alias("k"), F.col("id").cast("double").alias("v"))
        .write.mode("append").parquet(events_dir)
    )
    second = run_once()
    assert second["0"][0] == 25 + 10
    assert second["2"][1] == sum(range(2, 100, 4)) + sum(range(102, 140, 4))
