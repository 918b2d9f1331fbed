"""Task-count control at scale: split packing on the batch reader
(read.max-rows-per-partition), streaming rate limiting
(stream.max-fragments-per-batch), and vacuum of crashed-write staging
orphans."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import EqualTo

from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.datasource import (
    LanceDataSourceReader,
    LanceDataSourceStreamReader,
    register_lance_datasource,
)


def _runts(spark, path, n_frags=8, rows_each=25):
    """n_frags fragments of rows_each rows, one commit per fragment."""
    for i in range(n_frags):
        df = spark.range(i * rows_each, (i + 1) * rows_each).select(
            F.col("id"), (F.col("id") % 7).alias("g")
        )
        df.coalesce(1).write.format("lance").mode(
            "overwrite" if i == 0 else "append"
        ).save(path)


# ------------------------------------------------------- split packing


def test_packing_reduces_partitions_and_preserves_rows(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path)

    unpacked = spark.read.format("lance").load(path)
    assert unpacked.rdd.getNumPartitions() == 8  # default 1:1 stands
    packed = (
        spark.read.format("lance")
        .option("read.max-rows-per-partition", "50").load(path)
    )
    assert packed.rdd.getNumPartitions() == 4  # 2 x 25-row frags per task
    assert packed.count() == 200
    assert packed.agg(F.sum("id")).collect()[0][0] == sum(range(200))


def test_oversized_fragment_rides_alone(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path)
    r = LanceDataSourceReader({"path": path, "read.max-rows-per-partition": "10"})
    parts = r.partitions()
    assert len(parts) == 8  # cap below fragment size: no packing possible
    assert all(p.packed_files == () for p in parts)


def test_packing_composes_with_pruning(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path)  # fragment i holds ids [25i, 25i+25): zone-prunable
    r = LanceDataSourceReader({"path": path, "read.max-rows-per-partition": "100"})
    r.pushFilters([EqualTo(("id",), 130)])  # only fragment 5 can match
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].packed_files == ()
    got = (
        spark.read.format("lance").option("read.max-rows-per-partition", "100")
        .load(path).filter("id = 130").collect()
    )
    assert len(got) == 1 and got[0].id == 130


def test_invalid_pack_option_rejected(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=1)
    with pytest.raises(ValueError, match="must be positive"):
        LanceDataSourceReader({"path": path, "read.max-rows-per-partition": "0"})


# -------------------------------------------------- stream rate limit


def test_stream_reader_caps_fragments_per_batch(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path)  # 8 versions, one new fragment each

    r = LanceDataSourceStreamReader(
        {"path": path, "stream.max-fragments-per-batch": "3"}
    )
    start = r.initialOffset()
    delivered, batches = [], 0
    while True:
        end = r.latestOffset()
        if end["version"] <= start["version"]:
            break
        parts = r.partitions(start, end)
        assert len(parts) <= 3  # the cap
        delivered.extend(parts)
        batches += 1
        start = end
    assert len(delivered) == 8  # everything arrives eventually
    assert batches >= 3  # 8 fragments / cap 3 -> at least 3 micro-batches


def test_stream_reader_uncapped_delivers_everything_at_once(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path)
    r = LanceDataSourceStreamReader({"path": path})
    end = r.latestOffset()
    assert len(r.partitions(r.initialOffset(), end)) == 8


def test_stream_e2e_with_cap_delivers_all_rows(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _runts(spark, path, n_frags=4)
    # NOTE availableNow falls back to single-batch for Python sources —
    # a capped stream needs multiple triggers, so run processing-time
    # triggers until the backlog drains
    q = (
        spark.readStream.format("lance")
        .option("stream.max-fragments-per-batch", "1").load(path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds").start()
    )
    try:
        deadline = time.time() + 120
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(out).count()
            except Exception:
                n = 0
            if n == 100:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n == 100


def test_capped_latest_offset_never_regresses_after_restart(spark, tmp_path):
    """Restart safety: a NEW reader (checkpoint restore — Spark does NOT
    call initialOffset) must not return a capped offset below the
    committed one; the first trigger is uncapped, later ones capped."""
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=6)

    # first run: fresh query (initialOffset primes the cap) processes
    # three capped batches and "checkpoints" at version 5
    a = LanceDataSourceStreamReader({"path": path, "stream.max-fragments-per-batch": "2"})
    start = a.initialOffset()
    while True:
        end = a.latestOffset()
        if end["version"] <= start["version"]:
            break
        assert len(a.partitions(start, end)) <= 2
        start = end
    committed = start
    assert committed["version"] == 5

    # restart: new reader, NO initialOffset — the first latestOffset
    # must be >= the committed offset (uncapped), or Spark would log a
    # smaller offset and re-deliver everything after it
    b = LanceDataSourceStreamReader({"path": path, "stream.max-fragments-per-batch": "2"})
    first = b.latestOffset()
    assert first["version"] >= committed["version"]
    assert b.partitions(committed, first) == []  # nothing new: no re-delivery

    # new data after the restart: now capped again (reader is primed)
    for i in range(6, 11):
        spark.range(i * 25, (i + 1) * 25).select(
            F.col("id"), (F.col("id") % 7).alias("g")
        ).coalesce(1).write.format("lance").mode("append").save(path)
    nxt = b.latestOffset()
    parts = b.partitions(first, nxt)
    assert 1 <= len(parts) <= 2  # the cap is back in force


def test_capped_stream_survives_vacuumed_intermediate_versions(spark, tmp_path):
    """Versions vacuumed mid-chain can't be batch boundaries, but the
    capped walk must skip them instead of crashing on the missing
    manifest (the uncapped stream never reads them at all)."""
    from flink_connector_lance_spark.sources.maintenance import vacuum_dataset

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=6)
    vacuum_dataset(path, keep_versions=2)  # manifests 0..3 gone

    r = LanceDataSourceStreamReader({"path": path, "stream.max-fragments-per-batch": "2"})
    start = r.initialOffset()
    delivered = []
    while True:
        end = r.latestOffset()  # must not raise
        if end["version"] <= start["version"]:
            break
        delivered.extend(r.partitions(start, end))
        start = end
    # every fragment of the surviving latest version arrives
    assert len(delivered) == 6


def test_invalid_stream_cap_rejected(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=1)
    with pytest.raises(ValueError, match="must be positive"):
        LanceDataSourceStreamReader({"path": path, "stream.max-fragments-per-batch": "-1"})


# --------------------------------------------- batch incremental read


def test_delta_from_version_reads_only_appends(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=3)  # versions 0..2, 25 rows each
    delta = (
        spark.read.format("lance")
        .option("read.delta-from-version", "0").load(path)
    )
    assert delta.count() == 50  # versions 1 and 2 only
    assert delta.agg(F.min("id")).collect()[0][0] == 25
    # composes with pushdown: the pruned delta still filters correctly
    assert delta.filter("id >= 70").count() == 5
    # delta from the latest version is empty
    empty = (
        spark.read.format("lance")
        .option("read.delta-from-version", "2").load(path)
    )
    assert empty.count() == 0


def test_delta_from_version_refuses_rewrites(spark, tmp_path):
    # a compaction between the versions puts OLD rows under NEW file
    # names; a raw file diff would deliver them as delta rows
    # (double-processing), so the read must fail fast unless the caller
    # opts into the raw diff
    from flink_connector_lance_spark.sources.maintenance import (
        compact_dataset,
        read_version_delta,
    )

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=3)  # versions 0..2, 25 rows each
    compact_dataset(spark, path, target_rows_per_fragment=1_000_000)  # v3
    with pytest.raises(Exception, match="rewritten"):
        (spark.read.format("lance")
         .option("read.delta-from-version", "0").load(path).count())
    with pytest.raises(ValueError, match="rewritten"):
        read_version_delta(spark, path, from_version=0)
    # opting in yields the raw file diff: every current file is new
    raw = (
        spark.read.format("lance")
        .option("read.delta-from-version", "0")
        .option("read.delta-allow-rewrites", "true").load(path)
    )
    assert raw.count() == 75
    assert read_version_delta(spark, path, 0, allow_rewrites=True).count() == 75
    # append-only histories are still deltas without any flag
    _append_one(spark, path)  # v4
    delta = (
        spark.read.format("lance")
        .option("read.delta-from-version", "3").load(path)
    )
    assert delta.count() == 25


def _append_one(spark, path):
    base = spark.range(100, 125).select(F.col("id"), (F.col("id") % 7).alias("g"))
    base.coalesce(1).write.format("lance").mode("append").save(path)


def test_delta_from_version_validation(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=1)
    with pytest.raises(ValueError, match="must be >= 0"):
        LanceDataSourceReader({"path": path, "read.delta-from-version": "-1"})


# ------------------------------------------------ staging-orphan vacuum


def test_vacuum_removes_stale_staging_keeps_fresh(spark, tmp_path):
    from flink_connector_lance_spark.sources.maintenance import vacuum_dataset

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _runts(spark, path, n_frags=2)
    dead = os.path.join(path, "_staging-deadbeef")
    fresh = os.path.join(path, "_staging-inflight")
    os.makedirs(dead)
    os.makedirs(fresh)
    old = time.time() - 48 * 3600
    os.utime(dead, (old, old))
    res = vacuum_dataset(path, keep_versions=2)
    assert res["staging_dirs_removed"] == 1
    assert not os.path.exists(dead)
    assert os.path.exists(fresh)  # a live writer's staging is untouched
    # dry_run reports without deleting
    os.makedirs(dead)
    os.utime(dead, (old, old))
    res2 = vacuum_dataset(path, keep_versions=1, dry_run=True)
    assert res2["staging_dirs_removed"] == 1 and os.path.exists(dead)
