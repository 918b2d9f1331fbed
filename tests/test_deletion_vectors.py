"""Deletion vectors on native binary datasets: the manifest's
Fragment.deletion_file (table.proto f3) plus an Arrow tombstone sidecar
in `_deletions/` — lance's own DELETE shape (the data file never moves;
reads mask the tombstoned offsets). Covers the pure codec round trip,
the O(deleted-rows) DELETE path, every read route (driver read,
distributed scan, format reader, count fast path/probe), maintenance
interop (rewrites must never resurrect tombstoned rows), version
travel, and vacuum GC of superseded vectors."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources import lance_format as LF


def test_codec_deletion_roundtrip(tmp_path):
    """commit_native carries a deletion descriptor; the manifest encodes
    Fragment.deletion_file; every pure-codec read masks the offsets."""
    root = str(tmp_path / "ds")
    tbl = pa.table({"id": pa.array(range(10), pa.int64()),
                    "s": pa.array([f"v{i}" for i in range(10)], pa.string())})
    os.makedirs(os.path.join(root, LF.DATA_DIR))
    LF.write_native_file(tbl, os.path.join(root, LF.DATA_DIR, "a.lance"))
    fields = LF.fields_of_arrow_schema(tbl.schema)
    LF.commit_native(root, fields, [("a.lance", 10, None)], "overwrite")

    d = LF.write_deletion_arrow(root, 0, 1, 1, [2, 5, 7])
    LF.commit_native(root, fields,
                     [("a.lance", 10, None, None, None, d, 0)], "overwrite",
                     expected_base_version=1)
    mf = LF.read_native_manifest(root)
    assert mf.fragments[0].deletion["num_deleted"] == 3
    assert mf.fragments[0].fragment_id == 0  # explicit id preserved
    assert mf.row_count == 7  # live rows, not physical
    got = LF.read_native_dataset(root)
    assert got.column("id").to_pylist() == [0, 1, 3, 4, 6, 8, 9]
    # time travel: version 1 predates the tombstones
    assert LF.read_native_dataset(root, version=1).num_rows == 10
    # manifest bytes round-trip the descriptor (decode -> re-encode)
    mf2 = LF.read_native_manifest(root, 2)
    assert mf2.fragments[0].deletion == {"read_version": 1, "id": 1,
                                         "file_type": "arrow",
                                         "num_deleted": 3}


def test_bitmap_deletion_refuses_loudly(tmp_path):
    root = str(tmp_path / "ds")
    tbl = pa.table({"id": pa.array(range(4), pa.int64())})
    os.makedirs(os.path.join(root, LF.DATA_DIR))
    LF.write_native_file(tbl, os.path.join(root, LF.DATA_DIR, "a.lance"))
    fields = LF.fields_of_arrow_schema(tbl.schema)
    d = {"read_version": 1, "id": 1, "file_type": "bitmap", "num_deleted": 1}
    LF.commit_native(root, fields,
                     [("a.lance", 4, None, None, None, d, 0)], "overwrite")
    # counting works from the manifest alone (num_deleted_rows)...
    assert LF.native_count_rows(root) == 3
    # ...but a row-level read refuses by name instead of misreading
    with pytest.raises(NotImplementedError, match="ROARING-BITMAP"):
        LF.read_native_dataset(root)


def test_delete_rows_with_deletion_vectors(spark, tmp_path):
    """delete_rows(use_deletion_vectors=True): data files byte-identical,
    one tombstone sidecar per affected fragment, every read route masks,
    re-deletes union, and compaction materializes the tombstones."""
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )
    from flink_connector_lance_spark.sources.maintenance import (
        compact_dataset,
        delete_rows,
        vacuum_dataset,
    )
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    df = spark.range(600).selectExpr("id", "id % 7 AS g",
                                     "concat('d', id) AS name")
    write_native_pure(df.repartition(2), path, mode="overwrite")
    data_dir = os.path.join(path, LF.DATA_DIR)
    bytes_before = {n: os.path.getsize(os.path.join(data_dir, n))
                    for n in os.listdir(data_dir)}

    m = delete_rows(spark, path, "id % 10 = 0", use_deletion_vectors=True)
    assert sum(f.row_count for f in m.fragments) == 540
    # the data plane never moved: same files, same bytes
    assert {n: os.path.getsize(os.path.join(data_dir, n))
            for n in os.listdir(data_dir)} == bytes_before
    assert len(os.listdir(os.path.join(path, LF.DELETIONS_DIR))) == 2

    # every read route masks the tombstones
    assert LF.native_count_rows(path) == 540
    out = read_dataset(spark, path)
    assert out.count() == 540 and out.filter("id % 10 = 0").count() == 0
    register_lance_datasource(spark)
    fmt = spark.read.format("lance").load(path)
    assert fmt.count() == 540
    assert fmt.filter("id < 100").count() == 90  # pushed filter composes
    probe = (spark.read.format("lance")
             .option("read.file-column", "__frag").load(path)
             .groupBy("__frag").count().collect())  # _count_one route
    assert sum(r["count"] for r in probe) == 540
    # version travel: the pre-delete version still shows all rows
    assert (spark.read.format("lance").option("version", "1").load(path)
            .count() == 600)

    # second vector delete UNIONS with the existing tombstones
    m2 = delete_rows(spark, path, "id % 10 = 5", use_deletion_vectors=True)
    assert sum(f.row_count for f in m2.fragments) == 480
    assert read_dataset(spark, path).count() == 480

    # maintenance interop: a compaction rewrite materializes the
    # tombstones (deleted rows must NOT resurrect) and drops the vectors
    m3 = compact_dataset(spark, path, target_rows_per_fragment=1000,
                         small_threshold=10_000)
    assert m3.row_count == 480
    assert read_dataset(spark, path).filter("id % 5 = 0").count() == 0
    mf = LF.read_native_manifest(path)
    assert all(fr.deletion is None for fr in mf.fragments)

    # vacuum GCs the superseded deletion files with the old versions
    rep = vacuum_dataset(path, keep_versions=1)
    assert not os.path.exists(os.path.join(path, LF.DELETIONS_DIR)) or \
        os.listdir(os.path.join(path, LF.DELETIONS_DIR)) == []
    assert rep["deleted_files"] >= 3  # 2 pre-compaction data files + vectors
    assert read_dataset(spark, path).count() == 480


def test_cow_delete_and_merge_respect_existing_vectors(spark, tmp_path):
    """A copy-on-write DELETE/MERGE over fragments that already carry a
    deletion vector must mask it in the probe AND the survivor rescan —
    and carried untouched fragments keep their vectors (explicit
    fragment ids keep the tombstone keys resolvable)."""
    from flink_connector_lance_spark.sources.maintenance import (
        delete_rows,
        merge_rows,
    )
    from flink_connector_lance_spark.sources.reader import read_dataset
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    df = spark.range(400).selectExpr("id", "id % 3 AS g")
    write_native_pure(df.repartition(2), path, mode="overwrite")
    delete_rows(spark, path, "id < 40", use_deletion_vectors=True)
    assert read_dataset(spark, path).count() == 360

    # copy-on-write delete of a disjoint slice: tombstoned rows stay gone
    delete_rows(spark, path, "id >= 390")
    out = read_dataset(spark, path)
    assert out.count() == 350
    assert out.filter("id < 40").count() == 0  # no resurrection

    # MERGE updates through the same masked scan
    updates = spark.createDataFrame([(100, 99)], "id long, g long")
    merge_rows(spark, path, updates, key="id")
    out = read_dataset(spark, path)
    assert out.count() == 350
    assert out.filter("g = 99").count() == 1
    assert out.filter("id < 40").count() == 0
