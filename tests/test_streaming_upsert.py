"""Streaming upsert sink: CDC-style micro-batches MERGE into the dataset
by key with exactly-once epochs — the changelog-consuming counterpart of
the insert-only streaming sink."""

from __future__ import annotations

import os

from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.reader import read_dataset
from flink_connector_lance_spark.streaming.sink import (
    commit_epoch_upsert,
    stream_upsert_dataset,
)


def _write_batch(spark, src, name, rows):
    spark.createDataFrame(rows, "id long, val string, seq long").coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(src, name))


def _stream(spark, src):
    return (spark.readStream.schema("id long, val string, seq long")
            .option("maxFilesPerTrigger", "1").parquet(src + "/*"))


def test_stream_upsert_materializes_latest_state_per_key(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "ds", "ck"))
    os.makedirs(src)

    _write_batch(spark, src, "b1", [(1, "a1", 1), (2, "b1", 1), (3, "c1", 1)])
    q = stream_upsert_dataset(_stream(spark, src), out, ckpt, key="id",
                              trigger_available_now=True)
    q.awaitTermination(120)
    state = {r.id: r.val for r in read_dataset(spark, out).collect()}
    assert state == {1: "a1", 2: "b1", 3: "c1"}

    # batch 2 updates key 2, inserts key 4; key 1/3 untouched
    _write_batch(spark, src, "b2", [(2, "b2", 2), (4, "d1", 2)])
    q2 = stream_upsert_dataset(_stream(spark, src), out, ckpt, key="id",
                               trigger_available_now=True)
    q2.awaitTermination(120)
    df = read_dataset(spark, out)
    assert {r.id: r.val for r in df.collect()} == {1: "a1", 2: "b2", 3: "c1", 4: "d1"}
    assert df.count() == 4  # upsert, not append: one row per key

    # MVCC: the pre-update version still shows the old value of key 2
    first_v = 0
    v0 = {r.id: r.val for r in read_dataset(spark, out, version=first_v).collect()}
    assert v0[2] == "b1" and 4 not in v0


def test_stream_upsert_epochs_are_idempotent(spark, tmp_path):
    out = str(tmp_path / "ds")
    b = spark.createDataFrame([(1, "x", 1)], "id long, val string, seq long")
    assert commit_epoch_upsert(b, 0, out, key="id") is not None
    v_after = FR.latest_version(out)
    # redelivered epoch: no new version, no data change
    assert commit_epoch_upsert(b, 0, out, key="id") is None
    assert FR.latest_version(out) == v_after
    assert read_dataset(spark, out).count() == 1


def test_stream_upsert_last_writer_wins_within_batch(spark, tmp_path):
    out = str(tmp_path / "ds")
    seed = spark.createDataFrame([(1, "old", 0)], "id long, val string, seq long")
    commit_epoch_upsert(seed, 0, out, key="id")
    # one batch carries TWO versions of key 1: seq orders them
    b = spark.createDataFrame([(1, "mid", 5), (1, "new", 9), (2, "z", 1)],
                              "id long, val string, seq long")
    commit_epoch_upsert(b, 1, out, key="id", order_col="seq")
    state = {r.id: (r.val, r.seq) for r in read_dataset(spark, out).collect()}
    assert state == {1: ("new", 9), 2: ("z", 1)}


def test_stream_upsert_duplicate_keys_without_order_col_raise(spark, tmp_path):
    out = str(tmp_path / "ds")
    commit_epoch_upsert(
        spark.createDataFrame([(1, "a", 1)], "id long, val string, seq long"),
        0, out, key="id")
    dup = spark.createDataFrame([(1, "x", 1), (1, "y", 2)],
                                "id long, val string, seq long")
    try:
        commit_epoch_upsert(dup, 1, out, key="id")
        raise AssertionError("expected ValueError on duplicate keys")
    except ValueError as e:
        assert "duplicate" in str(e)


# --- first-wins dedup-append sink -------------------------------------------

def test_stream_dedup_append_first_write_wins(spark, tmp_path):
    from flink_connector_lance_spark.streaming.sink import stream_dedup_append_dataset

    src, out, ckpt = (str(tmp_path / d) for d in ("in", "ds", "ck"))
    os.makedirs(src)
    _write_batch(spark, src, "b1", [(1, "first", 1), (2, "b", 1)])
    q = stream_dedup_append_dataset(_stream(spark, src), out, ckpt, key="id",
                                    trigger_available_now=True)
    q.awaitTermination(120)

    # re-delivery of key 1 with different content + a new key
    _write_batch(spark, src, "b2", [(1, "SECOND", 2), (3, "c", 2)])
    q2 = stream_dedup_append_dataset(_stream(spark, src), out, ckpt, key="id",
                                     trigger_available_now=True)
    q2.awaitTermination(120)

    df = read_dataset(spark, out)
    assert df.count() == 3  # never a duplicate key
    state = {r.id: r.val for r in df.collect()}
    assert state == {1: "first", 2: "b", 3: "c"}  # first write won


def test_stream_dedup_append_dedupes_within_batch_deterministically(spark, tmp_path):
    from flink_connector_lance_spark.streaming.sink import commit_epoch_dedup_append

    out = str(tmp_path / "ds")
    b = spark.createDataFrame([(1, "x", 1), (1, "y", 2), (2, "z", 1)],
                              "id long, val string, seq long")
    commit_epoch_dedup_append(b, 0, out, key="id")
    df = read_dataset(spark, out)
    assert df.count() == 2
    # deterministic winner: lowest md5 of the row JSON, not partition luck
    import hashlib
    import json as _json

    cands = [{"id": 1, "val": "x", "seq": 1}, {"id": 1, "val": "y", "seq": 2}]
    win = min(cands, key=lambda r: hashlib.md5(
        _json.dumps(r, separators=(",", ":")).encode()).hexdigest())
    got = {r.id: r.val for r in df.collect()}
    assert got[1] == win["val"]


def test_stream_dedup_append_epochs_idempotent(spark, tmp_path):
    from flink_connector_lance_spark.sources import fragments as FR2
    from flink_connector_lance_spark.streaming.sink import commit_epoch_dedup_append

    out = str(tmp_path / "ds")
    b = spark.createDataFrame([(1, "a", 1)], "id long, val string, seq long")
    assert commit_epoch_dedup_append(b, 0, out, key="id") is not None
    v = FR2.latest_version(out)
    assert commit_epoch_dedup_append(b, 0, out, key="id") is None
    assert FR2.latest_version(out) == v and read_dataset(spark, out).count() == 1


def test_epoch_miss_check_is_bounded_on_emulated_chains(spark, tmp_path):
    """A FRESH epoch (always a miss) must not walk the whole emulated
    manifest chain: epoch values are monotonic ints, so the first
    manifest from the head that carries the key answers. The walk is
    bounded by the commits since the last epoch commit — on s3 an
    O(versions) walk would grow with every committed batch."""
    from flink_connector_lance_spark.sources.writer import write_dataset

    out = str(tmp_path / "ds")
    b = spark.createDataFrame([(1, "x", 1)], "id long, val string, seq long")
    for e in range(6):
        write_dataset(b, out, mode="append",
                      commit_meta={"stream_epoch": e})
    # two non-epoch commits on top (e.g. maintenance passes)
    write_dataset(b, out, mode="append")
    write_dataset(b, out, mode="append")

    calls = {"n": 0}
    real = FR.read_manifest

    def counting(root, version=None, storage_options=None):
        calls["n"] += 1
        return real(root, version, storage_options)

    FR.read_manifest = counting
    try:
        assert not FR.meta_value_committed(out, "stream_epoch", 6)  # fresh
        fresh_cost = calls["n"]
        calls["n"] = 0
        assert FR.meta_value_committed(out, "stream_epoch", 2)  # old epoch
        old_cost = calls["n"]
    finally:
        FR.read_manifest = real
    # walk stops at the first key-bearing manifest: 2 bare commits + it
    assert fresh_cost <= 3, f"fresh-epoch check read {fresh_cost} manifests"
    assert old_cost <= 3, f"old-epoch check read {old_cost} manifests"


def test_stream_upsert_order_col_ties_break_deterministically(spark, tmp_path):
    from flink_connector_lance_spark.streaming.sink import commit_epoch_upsert

    out = str(tmp_path / "ds")
    commit_epoch_upsert(
        spark.createDataFrame([(1, "seed", 0)], "id long, val string, seq long"),
        0, out, key="id")
    # two rows tie on seq: winner must be the lowest md5(row JSON), not
    # partition/arrival order
    b = spark.createDataFrame([(1, "x", 5), (1, "y", 5)],
                              "id long, val string, seq long")
    commit_epoch_upsert(b, 1, out, key="id", order_col="seq")
    import hashlib
    import json as _json

    cands = [{"id": 1, "val": "x", "seq": 5}, {"id": 1, "val": "y", "seq": 5}]
    win = min(cands, key=lambda r: hashlib.md5(
        _json.dumps(r, separators=(",", ":")).encode()).hexdigest())
    got = {r.id: r.val for r in read_dataset(spark, out).collect()}
    assert got[1] == win["val"]
