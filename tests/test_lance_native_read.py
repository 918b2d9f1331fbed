"""Parity against the reference's REAL Lance binary fixtures.

The reference ships committed Lance datasets (ref test-data/lance-db1..3,
lance-vector-search; written by lance 0.24.0, data format 2.0) and its
demos insert literal rows into them (ref table/FlinkSqlDemo.java:127-133
for lance-db1, :389-399 for lance-db3). These tests decode those exact
binary files with the stdlib-only reader in
``sources/lance_format.py`` — no ``lance`` package — and pin the decoded
rows to the demo's insert literals, then drive the same fixtures through
the distributed Spark reader and the ``vector_search`` SQL route
(mirroring the demo's Step-6 lateral query,
ref table/FlinkSqlDemo.java:591-600).
"""

from __future__ import annotations

import datetime

import pytest

from flink_connector_lance_spark.sources import lance_format as LF

REF = "/root/reference/test-data"
DB1 = f"{REF}/lance-db1"
DB2 = f"{REF}/lance-db2"
VEC = f"{REF}/lance-vector-search"

needs_fixtures = pytest.mark.skipif(
    not LF.is_native_dataset(DB1), reason="reference fixtures not present"
)


def f32(vals):
    """The fixtures store float32; literals like 0.1 round-trip through
    float32 — compare at the precision the file actually holds."""
    import numpy as np

    return np.asarray(vals, dtype=np.float32).tolist()


@needs_fixtures
def test_manifest_metadata():
    mf = LF.read_native_manifest(DB1)
    assert mf.version == 1
    assert mf.writer_version == "0.24.0"
    assert mf.data_format == "2.0"
    assert [f.name for f in mf.fields if f.parent == -1] == [
        "id", "title", "embedding"]
    assert mf.row_count == 5
    assert LF.native_count_rows(DB1) == 5  # manifest-only, no data IO


@needs_fixtures
def test_db1_rows_match_demo_insert():
    # ref table/FlinkSqlDemo.java:127-133 — the INSERT that wrote this file
    expected = [
        (1, "Introduction to AI", [0.1, 0.2, 0.3, 0.4]),
        (2, "Machine Learning Guide", [0.2, 0.3, 0.4, 0.5]),
        (3, "Deep Learning Basics", [0.3, 0.4, 0.5, 0.6]),
        (4, "Neural Networks", [0.4, 0.5, 0.6, 0.7]),
        (5, "Computer Vision", [0.5, 0.6, 0.7, 0.8]),
    ]
    tbl = LF.read_native_dataset(DB1)
    assert tbl.num_rows == 5
    rows = sorted(tbl.to_pylist(), key=lambda r: r["id"])
    for row, (rid, title, emb) in zip(rows, expected):
        assert row["id"] == rid
        assert row["title"] == title
        assert row["embedding"] == pytest.approx(f32(emb))


@needs_fixtures
def test_db2_unicode_and_timestamps():
    tbl = LF.read_native_dataset(DB2)
    assert tbl.num_rows == 5
    row = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])[0]
    assert row["title"] == "Flink入门指南"
    assert row["category"] == "tutorial"
    assert row["create_time"] == datetime.datetime(2024, 1, 1, 10, 0)


@needs_fixtures
def test_column_pruning_and_missing_column():
    import os

    mf = LF.read_native_manifest(DB1)
    fpath = os.path.join(DB1, LF.DATA_DIR, mf.fragments[0].file)
    tbl = LF.read_native_file(fpath, columns=["title", "id"])
    assert tbl.column_names == ["title", "id"]
    with pytest.raises(KeyError, match="no_such"):
        LF.read_native_file(fpath, columns=["no_such"])


@needs_fixtures
def test_file_is_self_describing():
    import os

    mf = LF.read_native_manifest(DB1)
    fpath = os.path.join(DB1, LF.DATA_DIR, mf.fragments[0].file)
    names = [f.name for f in LF.read_file_schema(fpath) if f.parent == -1]
    assert names == ["id", "title", "embedding"]


@needs_fixtures
def test_spark_distributed_read(spark):
    """The fragment-parallel route (mapInArrow, one task per fragment)
    serves native datasets through the pure decoder with the same
    pushdown surface as the emulated backend."""
    from flink_connector_lance_spark.sources.reader import read_dataset

    df = read_dataset(spark, DB1)
    assert [f.name for f in df.schema.fields] == ["id", "title", "embedding"]
    rows = df.orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0].title == "Introduction to AI"
    assert rows[0].embedding == pytest.approx(f32([0.1, 0.2, 0.3, 0.4]))

    pruned = read_dataset(spark, DB1, columns=["id", "title"],
                          filter="id >= 3", limit=2)
    got = sorted((r.id, r.title) for r in pruned.collect())
    assert got == [(3, "Deep Learning Basics"), (4, "Neural Networks")]


@needs_fixtures
def test_spark_read_timestamp_dataset(spark):
    from flink_connector_lance_spark.sources.reader import read_dataset

    rows = read_dataset(spark, DB2).orderBy("doc_id").collect()
    assert len(rows) == 5
    assert rows[0].create_time == datetime.datetime(2024, 1, 1, 10, 0)
    assert rows[0].title == "Flink入门指南"


@needs_fixtures
def test_vector_search_sql_over_native_fixture(spark):
    """The demo's own lateral query (ref table/FlinkSqlDemo.java:591-600)
    over the demo's own committed binary dataset."""
    from flink_connector_lance_spark.udtf import register_vector_search

    register_vector_search(spark)
    rows = spark.sql(f"""
        SELECT v.id, v.title, v._distance AS similarity_distance
        FROM vector_search('{VEC}', 'embedding',
                           ARRAY(0.15D,0.25D,0.35D,0.45D,0.55D,0.65D,0.75D,0.85D),
                           5, 'L2') AS v
        WHERE v._distance < 1.0
    """).collect()
    # id=4 ('向量数据库') stores exactly the query vector -> distance 0;
    # id=3 ('Kafka消息队列', the reversed ramp) lands beyond the 1.0 cut.
    assert [r.id for r in rows] == [4, 5, 1, 2]
    assert rows[0].similarity_distance == 0.0
    assert rows[0].title == "向量数据库"
    assert all(r.similarity_distance < 1.0 for r in rows)


@needs_fixtures
def test_format_lance_over_native_fixture(spark):
    """``spark.read.format("lance")`` — the user-facing DataSource route —
    serves the reference's binary fixtures: schema from the binary
    manifest, one task per ``.lance`` fragment, pushed filters evaluated
    over the decoded batches."""
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    df = spark.read.format("lance").load(DB1)
    assert [f.name for f in df.schema.fields] == ["id", "title", "embedding"]
    assert df.count() == 5

    got = (spark.read.format("lance").load(DB2)
           .filter("category = 'tutorial'")
           .select("doc_id", "title", "create_time").collect())
    assert len(got) == 1
    assert (got[0].doc_id, got[0].title) == (1, "Flink入门指南")
    assert got[0].create_time == datetime.datetime(2024, 1, 1, 10, 0)


@needs_fixtures
def test_unsupported_encoding_is_loud():
    """Corrupt/unknown shapes must raise, never silently misread."""
    with pytest.raises((NotImplementedError, ValueError, FileNotFoundError)):
        LF.read_native_manifest("/root/testdata/sf0.001")  # not a dataset
