"""Schema evolution: append-time add/drop columns without rewriting
history — manifest-recorded schema, null-filled old fragments, type-change
refusal, inheritance across maintenance commits, and both read paths
(read_dataset and format('lance'))."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.options import DatasetOptions
from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.maintenance import compact_dataset, delete_rows
from flink_connector_lance_spark.sources.reader import read_dataset
from flink_connector_lance_spark.sources.schema_evolution import dataset_schema
from flink_connector_lance_spark.sources.writer import write_dataset

EVOLVE = DatasetOptions(schema_evolution=True)


def _seed(spark, path, n=4):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(n)], "id long, a string")
    write_dataset(df, path, mode="overwrite")
    return df


def test_append_with_new_column_requires_opt_in(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path)
    b = spark.createDataFrame([(10, "x", 1.5)], "id long, a string, score double")
    with pytest.raises(ValueError, match="schema-evolution"):
        write_dataset(b, path, mode="append")


def test_evolved_append_null_fills_old_fragments(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    b = spark.createDataFrame([(10, "x", 1.5), (11, "y", 2.5)],
                              "id long, a string, score double")
    write_dataset(b, path, mode="append", options=EVOLVE)

    df = read_dataset(spark, path)
    assert df.columns == ["id", "a", "score"]
    rows = {r.id: r.score for r in df.collect()}
    assert rows[10] == 1.5 and rows[11] == 2.5
    assert all(rows[i] is None for i in range(3))
    # manifest records the evolved schema
    assert [f.name for f in dataset_schema(path).fields] == ["id", "a", "score"]


def test_time_travel_shows_pre_evolution_schema(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path)
    v0 = FR.latest_version(path)
    b = spark.createDataFrame([(10, "x", 1.5)], "id long, a string, score double")
    write_dataset(b, path, mode="append", options=EVOLVE)
    assert read_dataset(spark, path, version=v0).columns == ["id", "a"]
    assert read_dataset(spark, path).columns == ["id", "a", "score"]


def test_append_missing_column_writes_typed_nulls(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path)
    b = spark.createDataFrame([(20,)], "id long")  # no 'a'
    write_dataset(b, path, mode="append", options=EVOLVE)
    row = read_dataset(spark, path).filter(F.col("id") == 20).collect()[0]
    assert row.a is None


def test_type_change_always_refused(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path)
    b = spark.createDataFrame([(30, 7)], "id long, a long")  # a was string
    with pytest.raises(ValueError, match="cannot change column types"):
        write_dataset(b, path, mode="append", options=EVOLVE)


def test_same_columns_reordered_append_is_fine_without_opt_in(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path)
    b = spark.createDataFrame([("z", 40)], "a string, id long")
    write_dataset(b, path, mode="append")  # no evolution flag needed
    assert read_dataset(spark, path).filter(F.col("id") == 40).collect()[0].a == "z"


def test_maintenance_commits_inherit_evolved_schema(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    b = spark.createDataFrame([(10, "x", 1.5)], "id long, a string, score double")
    write_dataset(b, path, mode="append", options=EVOLVE)
    # DELETE rewrites fragments and commits with its own meta: the schema
    # must survive via commit inheritance
    delete_rows(spark, path, F.col("id") == 0)
    df = read_dataset(spark, path)
    assert df.columns == ["id", "a", "score"]
    assert df.count() == 3
    compact_dataset(spark, path, target_rows_per_fragment=100, small_threshold=100)
    assert read_dataset(spark, path).columns == ["id", "a", "score"]


def test_format_path_reads_evolved_dataset(spark, tmp_path):
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    b = spark.createDataFrame([(10, "x", 1.5)], "id long, a string, score double")
    write_dataset(b, path, mode="append", options=EVOLVE)

    df = spark.read.format("lance").option("path", path).load()
    assert df.columns == ["id", "a", "score"]
    rows = {r.id: r.score for r in df.collect()}
    assert rows[10] == 1.5 and rows[0] is None

    # pushed filter on the NEW column: old fragments predate it — must not
    # crash, and null-filled rows must not match
    got = df.filter(F.col("score") > 1.0).collect()
    assert [(r.id, r.score) for r in got] == [(10, 1.5)]
    # filter on an original column still prunes/pushes normally
    assert {r.id for r in df.filter(F.col("id") < 2).collect()} == {0, 1}
