"""Drive the native-lance read/write twins against the in-test fake
``lance`` (tests/fixtures/lance.py) so the executor-side plumbing —
mapInArrow fragment fan-out, Arrow schema bridging, per-partition
fragment production, driver single-commit — executes for real instead of
sitting dead behind ``HAVE_LANCE``.

The fake implements only the pylance API calls the twins make; these
tests verify the twins' own logic (argument flow, batch iteration,
version accounting), not lance itself.
"""

from __future__ import annotations

import os
import sys

import pytest

import flink_connector_lance_spark.sources.fragments as FR
from flink_connector_lance_spark.sources.reader import count_rows, read_dataset
from flink_connector_lance_spark.sources.writer import write_dataset

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture()
def fake_lance(spark, monkeypatch):
    """Make ``import lance`` resolve to the fake, on the driver AND in
    Spark's Python workers, and flip the HAVE_LANCE gate."""
    monkeypatch.syspath_prepend(FIXTURES)
    # the twins' closures import lance inside executors
    spark.sparkContext.addPyFile(os.path.join(FIXTURES, "lance.py"))
    monkeypatch.setattr(FR, "HAVE_LANCE", True)
    yield
    sys.modules.pop("lance", None)
    sys.modules.pop("lance.fragment", None)


def test_native_write_then_read_roundtrip(fake_lance, spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(100).selectExpr("id", "id % 5 AS label", "CAST(id * 1.5 AS DOUBLE) AS v")
    write_dataset(df, path, mode="overwrite")
    assert count_rows(path) == 100

    back = read_dataset(spark, path)
    assert back.count() == 100
    assert {r["label"] for r in back.select("label").distinct().collect()} == set(range(5))


def test_native_append_adds_a_version(fake_lance, spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(10).selectExpr("id", "id % 2 AS label", "CAST(id AS DOUBLE) AS v")
    write_dataset(df, path, mode="overwrite")
    write_dataset(df, path, mode="append")
    assert count_rows(path) == 20
    # MVCC: version 1 still reads the pre-append rows
    assert read_dataset(spark, path, version=1).count() == 10


def test_native_write_refuses_commit_meta_and_bloom(fake_lance, spark, tmp_path):
    """The native commit cannot carry rollup metadata or bloom sidecars:
    the write must fail THERE, not let create_rollup raise 'not a rollup'
    later or write.bloom-columns silently do nothing."""
    from flink_connector_lance_spark.options import DatasetOptions

    path = str(tmp_path / "ds")
    df = spark.range(10).selectExpr("id", "id % 2 AS label", "CAST(id AS DOUBLE) AS v")
    with pytest.raises(NotImplementedError, match="commit_meta"):
        write_dataset(df, path, mode="overwrite", commit_meta={"rollup": {}})
    with pytest.raises(NotImplementedError, match="bloom"):
        write_dataset(df, path, mode="overwrite",
                      options=DatasetOptions(path=path, bloom_columns=["id"]))


def test_native_read_pushdowns_flow_to_fragments(fake_lance, spark, tmp_path):
    path = str(tmp_path / "ds")
    df = spark.range(50).selectExpr("id", "id % 5 AS label", "CAST(id AS DOUBLE) AS v")
    write_dataset(df, path, mode="overwrite")

    out = read_dataset(spark, path, columns=["id", "label"], filter="label >= 2", limit=5)
    rows = out.collect()
    assert len(rows) == 5
    assert set(rows[0].asDict()) == {"id", "label"}
    assert all(r["label"] >= 2 for r in rows)


def test_native_index_build_routes_params_per_type(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.index import build_index
    from flink_connector_lance_spark.options import DatasetOptions

    path = str(tmp_path / "ds")
    df = spark.range(20).selectExpr("id", "array(CAST(id AS DOUBLE), 1.0d) AS emb")
    write_dataset(df, path, mode="overwrite")

    res = build_index(path, "emb", "ivf_pq",
                      options=DatasetOptions(path=path, index_num_partitions=8))
    assert res.success, res.error
    rec = json.load(open(f"{path}/_fake_index.json"))
    assert rec["index_type"] == "IVF_PQ"
    assert rec["num_partitions"] == 8
    assert "num_sub_vectors" in rec and "num_bits" in rec
    assert "m" not in rec  # HNSW-only knob must not leak into IVF_PQ

    res = build_index(path, "emb", "ivf_hnsw_pq", replace=True)
    assert res.success, res.error
    rec = json.load(open(f"{path}/_fake_index.json"))
    assert rec["index_type"] == "IVF_HNSW_PQ"
    assert "m" in rec and "ef_construction" in rec


def test_native_index_build_reports_bad_column_as_failure(fake_lance, spark, tmp_path):
    from flink_connector_lance_spark.index import build_index

    path = str(tmp_path / "ds")
    write_dataset(spark.range(5).selectExpr("id"), path, mode="overwrite")
    res = build_index(path, "no_such_col", "ivf_flat")
    assert not res.success
    assert "not in dataset schema" in res.error


def test_native_write_respects_max_rows_per_file(fake_lance, spark, tmp_path):
    from flink_connector_lance_spark.options import DatasetOptions

    path = str(tmp_path / "ds")
    df = spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(1)
    write_dataset(df, path, mode="overwrite",
                  options=DatasetOptions(path=path, write_max_rows_per_file=30))
    import lance  # the fake, via syspath_prepend

    frags = lance.dataset(path).get_fragments()
    assert len(frags) == 4  # 30+30+30+10
    assert max(f.count_rows() for f in frags) <= 30


def test_native_delete_twin_issues_dataset_delete(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.sources.maintenance import delete_rows

    path = str(tmp_path / "ds")
    df = spark.range(50).selectExpr("id", "id % 5 AS label")
    write_dataset(df, path, mode="overwrite")

    m = delete_rows(spark, path, "label = 1")
    assert sum(f.row_count for f in m.fragments) == 40
    assert count_rows(path) == 40
    ops = json.load(open(f"{path}/_fake_ops.json"))
    assert ops[-1]["op"] == "delete" and ops[-1]["predicate"] == "label = 1"
    # MVCC: pre-delete version still readable
    assert read_dataset(spark, path, version=m.version - 1).count() == 50
    # native delete requires a SQL string (no Column translation layer)
    import pyspark.sql.functions as F
    import pytest as _pt

    with _pt.raises(TypeError, match="SQL string"):
        delete_rows(spark, path, F.col("label") == 2)


def test_native_merge_twin_issues_merge_insert(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.sources.maintenance import merge_rows

    path = str(tmp_path / "ds")
    df = spark.range(20).selectExpr("id", "id AS label")
    write_dataset(df, path, mode="overwrite")

    updates = spark.createDataFrame([(3, 100), (4, 100), (77, 100)], "id long, label long")
    m = merge_rows(spark, path, updates, key="id")
    assert sum(f.row_count for f in m.fragments) == 21  # 2 updated, 1 inserted
    ops = json.load(open(f"{path}/_fake_ops.json"))
    assert ops[-1]["op"] == "merge_insert" and ops[-1]["on"] == "id"
    assert ops[-1]["when_matched_update_all"] and ops[-1]["when_not_matched_insert_all"]
    assert ops[-1]["update_rows"] == 3
    back = read_dataset(spark, path)
    assert back.filter("label = 100").count() == 3
    assert back.count() == 21

    # duplicate update keys refused BEFORE any native call
    import pytest as _pt

    dup = spark.createDataFrame([(1, 5), (1, 6)], "id long, label long")
    with _pt.raises(ValueError, match="duplicate"):
        merge_rows(spark, path, dup, key="id")


def test_native_vacuum_twin_issues_cleanup(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.sources.maintenance import vacuum_dataset

    path = str(tmp_path / "ds")
    df = spark.range(30).selectExpr("id", "id % 3 AS label")
    write_dataset(df, path, mode="overwrite")
    write_dataset(df.limit(5), path, mode="append")
    write_dataset(df, path, mode="overwrite")  # v1/v2 files now dead

    rep = vacuum_dataset(path, keep_versions=1)
    assert rep["dropped_versions"] == 2
    assert rep["reclaimed_bytes"] > 0
    ops = json.load(open(f"{path}/_fake_ops.json"))
    assert ops[-1]["op"] == "cleanup_old_versions"
    # latest version still reads; vacuumed versions are gone
    assert count_rows(path) == 30
    import pytest as _pt

    with _pt.raises(Exception):
        read_dataset(spark, path, version=1).count()


def test_native_add_column_twin_issues_add_columns(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.sources.schema_evolution import add_column

    path = str(tmp_path / "ds")
    write_dataset(spark.range(20).selectExpr("id", "id * 10 AS v"), path,
                  mode="overwrite")
    add_column(spark, path, "doubled", "v * 2")
    ops = json.load(open(f"{path}/_fake_ops.json"))
    assert ops[-1]["op"] == "add_columns"
    assert ops[-1]["exprs"] == {"doubled": "v * 2"}
    df = read_dataset(spark, path)
    assert "doubled" in df.columns
    assert {(r.id, r.doubled) for r in df.collect()} == {(i, i * 20) for i in range(20)}
    # native add_column requires a SQL string expression
    import pyspark.sql.functions as F
    import pytest as _pt

    with _pt.raises(TypeError, match="SQL string"):
        add_column(spark, path, "bad", F.col("v") + 1)


def test_native_drop_columns_twin_issues_drop_columns(fake_lance, spark, tmp_path):
    import json

    from flink_connector_lance_spark.sources.schema_evolution import drop_columns

    path = str(tmp_path / "ds")
    write_dataset(spark.range(10).selectExpr("id", "id % 3 AS label", "id * 2 AS v"),
                  path, mode="overwrite")
    drop_columns(path, ["label"])
    ops = json.load(open(f"{path}/_fake_ops.json"))
    assert ops[-1]["op"] == "drop_columns" and ops[-1]["columns"] == ["label"]
    assert read_dataset(spark, path).columns == ["id", "v"]
