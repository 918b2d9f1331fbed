"""Schema evolution: append-time add/drop columns without rewriting
history — manifest-recorded schema, null-filled old fragments, type-change
refusal, inheritance across maintenance commits, and both read paths
(read_dataset and format('lance'))."""

from __future__ import annotations

import os

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


# --- column lifecycle: drop_columns / add_column -----------------------------

def test_drop_columns_is_metadata_only_and_narrows_both_read_paths(spark, tmp_path):
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource
    from flink_connector_lance_spark.sources.schema_evolution import drop_columns

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    files_before = sorted(f.file for f in FR.read_manifest(path).fragments)
    v_before = FR.latest_version(path)
    drop_columns(path, ["a"])
    # metadata-only: same fragment files, one new version
    assert sorted(f.file for f in FR.read_manifest(path).fragments) == files_before
    assert FR.latest_version(path) == v_before + 1
    assert read_dataset(spark, path).columns == ["id"]
    assert spark.read.format("lance").option("path", path).load().columns == ["id"]
    # time travel: the column is still there in the old version
    assert read_dataset(spark, path, version=v_before).columns == ["id", "a"]


def test_drop_columns_validation(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import drop_columns

    path = str(tmp_path / "ds")
    _seed(spark, path)
    with pytest.raises(ValueError, match="non-existent"):
        drop_columns(path, ["nope"])
    with pytest.raises(ValueError, match="every column"):
        drop_columns(path, ["id", "a"])
    with pytest.raises(ValueError, match="at least one"):
        drop_columns(path, [])


def test_dropped_column_cannot_be_resurrected_by_append(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import drop_columns

    path = str(tmp_path / "ds")
    _seed(spark, path)
    drop_columns(path, ["a"])
    back = spark.createDataFrame([(50, "stale?")], "id long, a string")
    with pytest.raises(ValueError, match="re-add dropped"):
        write_dataset(back, path, mode="append", options=EVOLVE)
    # the guard survives a maintenance rewrite (old fragments persist)
    delete_rows(spark, path, F.col("id") == 0)
    with pytest.raises(ValueError, match="re-add dropped"):
        write_dataset(back, path, mode="append", options=EVOLVE)


def test_add_column_backfills_and_clears_resurrection_guard(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import (
        add_column,
        drop_columns,
        dropped_columns,
    )

    path = str(tmp_path / "ds")
    _seed(spark, path, n=4)  # columns: id, a (a = "v{i}")
    drop_columns(path, ["a"])
    assert dropped_columns(path) == ["a"]
    # re-introduce the NAME via a rewriting backfill: old "v{i}" values
    # must NOT resurface
    add_column(spark, path, "a", "concat('new', cast(id as string))")
    df = read_dataset(spark, path)
    assert df.columns == ["id", "a"]
    assert {r.a for r in df.collect()} == {f"new{i}" for i in range(4)}
    assert dropped_columns(path) == []
    # and an evolving append with 'a' works again
    write_dataset(spark.createDataFrame([(99, "ok")], "id long, a string"),
                  path, mode="append")
    assert read_dataset(spark, path).filter(F.col("id") == 99).collect()[0].a == "ok"


def test_add_column_computed_values_and_refusals(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import add_column

    path = str(tmp_path / "ds")
    _seed(spark, path, n=5)
    add_column(spark, path, "id_sq", F.col("id") * F.col("id"))
    got = {r.id: r.id_sq for r in read_dataset(spark, path).collect()}
    assert got == {i: i * i for i in range(5)}
    with pytest.raises(ValueError, match="already exists"):
        add_column(spark, path, "id_sq", "id + 1")


def test_full_overwrite_clears_resurrection_guard(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import (
        drop_columns,
        dropped_columns,
    )

    path = str(tmp_path / "ds")
    _seed(spark, path)
    drop_columns(path, ["a"])
    # a full overwrite replaces every fragment: no stale bytes survive
    write_dataset(spark.createDataFrame([(1, "fresh")], "id long, a string"),
                  path, mode="overwrite")
    assert dropped_columns(path) == []
    write_dataset(spark.createDataFrame([(2, "more")], "id long, a string"),
                  path, mode="append")
    assert read_dataset(spark, path).count() == 2


# --- maintenance over heterogeneous fragments (the data-loss guard) ----------

def test_compaction_of_mixed_schema_runts_preserves_evolved_column(spark, tmp_path):
    # pre-evolution runt + post-evolution runt compact into ONE fragment:
    # a raw (sampled-schema) scan would silently drop 'score' from the
    # rewrite — the table-schema-resolved scan must keep it
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    write_dataset(spark.createDataFrame([(10, "x", 1.5)],
                                        "id long, a string, score double"),
                  path, mode="append", options=EVOLVE)
    n_before = len(FR.read_manifest(path).fragments)
    m = compact_dataset(spark, path, target_rows_per_fragment=1000,
                        small_threshold=1000)
    assert len(m.fragments) <= n_before  # rewrote the runts, never grew
    df = read_dataset(spark, path)
    assert df.columns == ["id", "a", "score"]
    rows = {r.id: r.score for r in df.collect()}
    assert rows[10] == 1.5 and rows[0] is None


def test_delete_predicate_on_evolved_column_spans_old_fragments(spark, tmp_path):
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    write_dataset(spark.createDataFrame([(10, "x", 9.0), (11, "y", 0.5)],
                                        "id long, a string, score double"),
                  path, mode="append", options=EVOLVE)
    # predicate references the NEW column: old fragments null-fill (NULL
    # predicate -> row survives, per SQL three-valued DELETE)
    delete_rows(spark, path, F.col("score") > 1.0)
    got = {r.id for r in read_dataset(spark, path).collect()}
    assert got == {0, 1, 2, 11}


def test_merge_on_evolved_table_aligns_updates(spark, tmp_path):
    from flink_connector_lance_spark.sources.maintenance import merge_rows

    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    write_dataset(spark.createDataFrame([(10, "x", 1.0)],
                                        "id long, a string, score double"),
                  path, mode="append", options=EVOLVE)
    upd = spark.createDataFrame([(0, "updated", 7.0), (20, "new", 8.0)],
                                "id long, a string, score double")
    merge_rows(spark, path, upd, "id")
    rows = {r.id: (r.a, r.score) for r in read_dataset(spark, path).collect()}
    assert rows[0] == ("updated", 7.0)
    assert rows[20] == ("new", 8.0)
    assert rows[1] == ("v1", None)  # pre-evolution row untouched, null-filled


def test_table_statistics_exclude_dropped_columns(spark, tmp_path):
    from flink_connector_lance_spark.sources.maintenance import table_statistics
    from flink_connector_lance_spark.sources.schema_evolution import drop_columns

    path = str(tmp_path / "ds")
    _seed(spark, path)
    assert "a" in table_statistics(path)["columns"]
    drop_columns(path, ["a"])
    assert "a" not in table_statistics(path)["columns"]
    assert "id" in table_statistics(path)["columns"]


def test_stream_read_of_evolved_dataset_aligns_old_fragments(spark, tmp_path):
    # readStream over a dataset that evolved mid-history: the pre-evolution
    # fragment must stream with the evolved schema (score null-filled)
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=2)
    write_dataset(spark.createDataFrame([(10, "x", 3.5)],
                                        "id long, a string, score double"),
                  path, mode="append", options=EVOLVE)
    q = (spark.readStream.format("lance").option("path", path).load()
         .writeStream.format("memory").queryName("evolved_stream")
         .trigger(availableNow=True).outputMode("append").start())
    q.awaitTermination(120)
    rows = {r.id: r.score for r in spark.sql("SELECT * FROM evolved_stream").collect()}
    assert rows == {0: None, 1: None, 10: 3.5}


# --- format("lance") write-path schema contract ------------------------------

def test_format_append_refuses_mismatched_schema_and_drops_orphans(spark, tmp_path):
    import os as _os

    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=2)
    files_before = sorted(f.file for f in FR.read_manifest(path).fragments)
    v_before = FR.latest_version(path)
    bad = spark.createDataFrame([(9, "x", 1.0)], "id long, a string, score double")
    with pytest.raises(Exception, match="schema-evolution"):
        bad.write.format("lance").option("path", path).mode("append").save()
    # refused append: no new version, no orphaned fragment files on disk
    assert FR.latest_version(path) == v_before
    data_files = sorted(
        _os.path.join("data", n) for n in _os.listdir(_os.path.join(path, "data")))
    assert data_files == files_before


def test_format_append_with_evolution_option_commits_union_schema(spark, tmp_path):
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=2)
    b = spark.createDataFrame([(9, "x", 1.0)], "id long, a string, score double")
    (b.write.format("lance").option("path", path)
     .option("write.schema-evolution", "true").mode("append").save())
    df = spark.read.format("lance").option("path", path).load()
    assert df.columns == ["id", "a", "score"]
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {0: None, 1: None, 9: 1.0}


def test_format_append_type_conflict_always_refused(spark, tmp_path):
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=2)
    bad = spark.createDataFrame([(9, 7)], "id long, a long")  # a was string
    with pytest.raises(Exception, match="change column types"):
        (bad.write.format("lance").option("path", path)
         .option("write.schema-evolution", "true").mode("append").save())


# --- review regressions ------------------------------------------------------

def test_not_equal_filter_on_evolved_table(spark, tmp_path):
    # Not(EqualTo) is a pushed filter with no .attribute of its own; the
    # aligned read path must unwrap it instead of crashing
    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    _seed(spark, path, n=3)
    write_dataset(spark.createDataFrame([(10, "x", 1.5)],
                                        "id long, a string, score double"),
                  path, mode="append", options=EVOLVE)
    df = spark.read.format("lance").option("path", path).load()
    got = {r.id for r in df.filter(F.col("a") != "v0").collect()}
    assert got == {1, 2, 10}
    # Not over the NEW column against a pre-evolution fragment
    got2 = {r.id for r in df.filter(F.col("score") != 1.5).collect()}
    assert got2 == set()  # nulls don't match != in SQL semantics


def test_stream_format_write_enforces_schema_contract(spark, tmp_path):
    # writeStream.format("lance") must refuse a drifting micro-batch the
    # same way the batch writer does, and honor the evolution option
    import os as _os

    from flink_connector_lance_spark.sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    path, src, ck1, ck2 = (str(tmp_path / d) for d in ("ds", "in", "c1", "c2"))
    _os.makedirs(src)
    _seed(spark, path, n=2)

    spark.createDataFrame([(9, "x", 1.0)], "id long, a string, score double") \
        .coalesce(1).write.parquet(src + "/b1")
    stream = spark.readStream.schema("id long, a string, score double").parquet(src + "/*")
    q = (stream.writeStream.format("lance").option("path", path)
         .option("checkpointLocation", ck1).trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
        failed = q.exception() is not None
    except Exception:
        failed = True
    assert failed, "drifting stream batch must fail, not poison the dataset"
    assert FR.latest_version(path) == 0  # nothing committed

    q2 = (stream.writeStream.format("lance").option("path", path)
          .option("write.schema-evolution", "true")
          .option("checkpointLocation", ck2).trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert q2.exception() is None
    df = read_dataset(spark, path)
    assert df.columns == ["id", "a", "score"]
    assert {r.id: r.score for r in df.collect()} == {0: None, 1: None, 9: 1.0}


def test_concurrent_evolving_appends_union_schemas(spark, tmp_path):
    # writer B computed its schema before writer A's commit won the race;
    # the commit retry loop must union, not overwrite
    import json as _json

    path = str(tmp_path / "ds")
    _seed(spark, path)  # schema: id, a
    # simulate A's winning evolving commit: append with (id, a, x)
    write_dataset(spark.createDataFrame([(50, "p", 1.0)],
                                        "id long, a string, x double"),
                  path, mode="append", options=EVOLVE)
    # B commits metadata computed against the PRE-A schema (id, a, y)
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    b_schema = StructType([StructField("id", LongType()), StructField("a", StringType()),
                           StructField("y", DoubleType())])
    FR.commit(path, [], mode="append", meta={"schema": b_schema.json()})
    final = _json.loads(FR.read_manifest(path).meta["schema"])
    names = [f["name"] for f in final["fields"]]
    assert names == ["id", "a", "x", "y"]  # A's x survived, B's y appended


def test_concurrent_type_conflict_refused_at_commit(spark, tmp_path):
    import pytest as _pt

    path = str(tmp_path / "ds")
    _seed(spark, path)
    write_dataset(spark.createDataFrame([(50, "p", 1.0)],
                                        "id long, a string, x double"),
                  path, mode="append", options=EVOLVE)
    from pyspark.sql.types import LongType, StructField, StructType

    conflicting = StructType([StructField("x", LongType())])
    with _pt.raises(ValueError, match="conflicting concurrent"):
        FR.commit(path, [], mode="append", meta={"schema": conflicting.json()})


# --- native (stdlib codec) schema evolution ---------------------------------

def _native(spark, path, n=20):
    from flink_connector_lance_spark.sources.writer import write_native_pure

    df = spark.range(n).selectExpr("id", "id % 3 AS g", "concat('d', id) AS name")
    write_native_pure(df.repartition(2), path, mode="overwrite")


def test_native_evolving_append_null_fills(spark, tmp_path):
    """write.schema-evolution on a NATIVE binary dataset: new columns ride
    after the live schema with fresh field ids past the live id space;
    carried fragments get their field mapping pinned (DataFile.fields)
    and null-fill the new column on read — lance's own evolution shape."""
    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    _native(spark, path)
    df2 = spark.range(20, 30).selectExpr(
        "id", "id % 3 AS g", "concat('d', id) AS name", "concat('T', id) AS tag")
    write_native_pure(df2, path, mode="append",
                      options=DatasetOptions(path=path, schema_evolution=True))
    out = read_dataset(spark, path)
    assert out.columns == ["id", "g", "name", "tag"]
    assert out.count() == 30 and out.filter("tag IS NULL").count() == 20
    # the widened manifest keeps the live ids and numbers the extra past them
    mf = LF.read_native_manifest(path)
    ids = {f.name: f.id for f in mf.fields if f.parent == -1}
    assert ids["tag"] > max(ids["id"], ids["g"], ids["name"])
    # carried fragments pin their pre-evolution field mapping (no tag id);
    # the fresh fragment's mapping includes it
    without_tag = [fr for fr in mf.fragments if ids["tag"] not in (fr.field_ids or [])]
    with_tag = [fr for fr in mf.fragments if ids["tag"] in (fr.field_ids or [])]
    assert len(without_tag) == 2 and len(with_tag) >= 1
    # plain append must now match the WIDENED schema
    with pytest.raises(ValueError, match="differs from table schema"):
        write_native_pure(spark.range(3).selectExpr("id", "id % 3 AS g",
                                                    "concat('d', id) AS name"),
                          path, mode="append")


def test_native_add_column_backfills_and_drop_is_metadata_only(spark, tmp_path):
    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.sources.schema_evolution import (
        add_column,
        drop_columns,
        native_dropped_columns,
    )

    path = str(tmp_path / "ds")
    _native(spark, path)
    add_column(spark, path, "bonus", "g * 100")
    out = read_dataset(spark, path)
    assert out.agg(F.sum("bonus")).collect()[0][0] == \
        sum((i % 3) * 100 for i in range(20))

    pre = LF.read_native_manifest(path).version
    files_before = {fr.file for fr in LF.read_native_manifest(path).fragments}
    drop_columns(path, ["name"])
    mf = LF.read_native_manifest(path)
    # metadata-only: byte-identical fragment carry-over, narrowed fields
    assert {fr.file for fr in mf.fragments} == files_before
    assert [f.name for f in mf.fields if f.parent == -1] == ["id", "g", "bonus"]
    assert native_dropped_columns(path) == ["name"]
    out = read_dataset(spark, path)
    assert out.columns == ["id", "g", "bonus"] and out.count() == 20
    # time travel keeps the pre-drop shape
    assert "name" in [f.name for f in LF.read_native_manifest(path, pre).fields]
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    assert "name" in (spark.read.format("lance").option("version", str(pre))
                      .load(path).columns)


def test_native_dropped_name_cannot_resurrect_via_append(spark, tmp_path):
    from flink_connector_lance_spark.sources.schema_evolution import drop_columns
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    _native(spark, path)
    drop_columns(path, ["name"])
    with pytest.raises(ValueError, match="re-add dropped"):
        write_native_pure(
            spark.range(3).selectExpr("id", "id % 3 AS g", "'x' AS name"),
            path, mode="append",
            options=DatasetOptions(path=path, schema_evolution=True))
    # a full-backfill add_column clears the guard (no stale fragment survives)
    from flink_connector_lance_spark.sources.schema_evolution import (
        add_column,
        native_dropped_columns,
    )

    add_column(spark, path, "name", "concat('n', id)")
    assert native_dropped_columns(path) == []
    assert read_dataset(spark, path).filter("name = 'n3'").count() == 1


def test_native_rewrite_of_nullable_fixed_width_roundtrips(spark, tmp_path):
    """The v2 encoder writes validity (Nullable.some_nulls) for flat
    primitives, so a backfill rewrite of an evolved table whose INT
    column carries nulls re-encodes them faithfully — the nulls survive
    the whole-table rewrite instead of refusing (pre-round-10 behavior)
    or silently zeroing."""
    from flink_connector_lance_spark.sources.schema_evolution import add_column
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    _native(spark, path)
    write_native_pure(
        spark.range(20, 25).selectExpr("id", "id % 3 AS g",
                                       "concat('d', id) AS name",
                                       "id * 10 AS extra"),
        path, mode="append",
        options=DatasetOptions(path=path, schema_evolution=True))
    # the evolved read null-fills the int column...
    assert read_dataset(spark, path).filter("extra IS NULL").count() == 20
    # ...and the whole-table rewrite re-encodes those nulls natively
    add_column(spark, path, "bonus", "g * 100")
    out = read_dataset(spark, path)
    assert out.filter("extra IS NULL").count() == 20
    assert out.filter("extra IS NOT NULL").count() == 5
    assert out.filter("bonus = g * 100").count() == 25


def test_native_count_probe_with_filter_on_evolved_column(spark, tmp_path):
    """The file-column-only count probe (datasource._count_one) resolves
    pushed filters on a POST-evolution column by null semantics on
    pre-evolution fragments (comparisons pass none, IS NULL passes all)
    instead of raising a missing-field error inside the decoder."""
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "ds")
    _native(spark, path)  # 20 rows / 2 fragments, columns id,g,name
    df2 = spark.range(20, 30).selectExpr(
        "id", "id % 3 AS g", "concat('d', id) AS name", "concat('T', id) AS tag")
    write_native_pure(df2, path, mode="append",
                      options=DatasetOptions(path=path, schema_evolution=True))
    register_lance_datasource(spark)

    def rd():  # fresh reader chain per query (option state is mutable)
        return (spark.read.format("lance")
                .option("read.file-column", "__frag").load(path))

    per_file = rd().filter("tag = 'T25'").groupBy("__frag").count().collect()
    assert len(per_file) == 1 and per_file[0]["count"] == 1
    # IS NULL on the evolved column passes every pre-evolution row
    nulls = rd().filter("tag IS NULL").groupBy("__frag").count().collect()
    assert sum(r["count"] for r in nulls) == 20


def test_native_format_writer_schema_evolution(spark, tmp_path):
    """write.schema-evolution on the format('lance') writer for NATIVE
    datasets (previously refused): tasks align live-prefix + new columns
    (align_evolving), the commit widens the field list with fresh ids
    past the live space, pre-evolution fragments null-fill on read, and
    the dropped-name resurrection guard still refuses with no orphans."""
    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )
    from flink_connector_lance_spark.sources.schema_evolution import (
        drop_columns,
    )

    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    (spark.range(20).selectExpr("id", "id % 3 AS g")
     .write.format("lance").option("write.native-format", "true")
     .mode("overwrite").save(path))
    # evolving append through the format writer: new column + missing none
    (spark.range(20, 30).selectExpr("id", "id % 3 AS g",
                                    "concat('T', id) AS tag")
     .write.format("lance").option("write.schema-evolution", "true")
     .mode("append").save(path))
    out = spark.read.format("lance").load(path)
    assert out.columns == ["id", "g", "tag"]
    assert out.count() == 30 and out.filter("tag IS NULL").count() == 20
    mf = LF.read_native_manifest(path)
    ids = {f.name: f.id for f in mf.fields if f.parent == -1}
    assert ids["tag"] > max(ids["id"], ids["g"])  # numbered past live ids
    # batch-missing live column lands as typed nulls
    (spark.range(30, 35).selectExpr("id", "concat('U', id) AS tag")
     .write.format("lance").option("write.schema-evolution", "true")
     .mode("append").save(path))
    out = spark.read.format("lance").load(path)
    assert out.count() == 35 and out.filter("g IS NULL").count() == 5
    # plain append must now match the widened schema
    with pytest.raises(Exception, match="match the dataset schema"):
        (spark.range(3).selectExpr("id", "id % 3 AS g")
         .write.format("lance").mode("append").save(path))
    # dropped names cannot resurrect through the evolving format append
    drop_columns(path, ["tag"])
    n_data = len(os.listdir(os.path.join(path, "data")))
    with pytest.raises(Exception, match="re-add dropped"):
        (spark.range(3).selectExpr("id", "id % 3 AS g",
                                   "concat('X', id) AS tag")
         .write.format("lance").option("write.schema-evolution", "true")
         .mode("append").save(path))
    # refusal left no orphan fragments behind
    assert len(os.listdir(os.path.join(path, "data"))) == n_data
    assert spark.read.format("lance").load(path).count() == 35


def test_native_stream_format_write_evolution(spark, tmp_path):
    """writeStream.format('lance') with write.schema-evolution on a
    NATIVE dataset: the first micro-batch widens the manifest (live ids
    preserved, extras past them), pre-evolution fragments null-fill, and
    without the option a drifting stream still refuses with nothing
    committed."""
    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.sources.datasource import (
        register_lance_datasource,
    )

    register_lance_datasource(spark)
    path, src = str(tmp_path / "ds"), str(tmp_path / "in")
    os.makedirs(src)
    (spark.range(10).selectExpr("id", "id % 2 AS g")
     .write.format("lance").option("write.native-format", "true")
     .mode("overwrite").save(path))
    v0 = LF.read_native_manifest(path).version

    spark.createDataFrame([(100, 0, "s1")], "id long, g long, tag string") \
        .coalesce(1).write.parquet(src + "/b1")
    stream = spark.readStream.schema("id long, g long, tag string") \
        .parquet(src + "/*")
    # no evolution option: the drifting stream refuses, nothing commits
    q = (stream.writeStream.format("lance").option("path", path)
         .option("checkpointLocation", str(tmp_path / "c1"))
         .trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
        failed = q.exception() is not None
    except Exception:
        failed = True
    assert failed and LF.read_native_manifest(path).version == v0

    q2 = (stream.writeStream.format("lance").option("path", path)
          .option("write.schema-evolution", "true")
          .option("checkpointLocation", str(tmp_path / "c2"))
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert q2.exception() is None
    out = spark.read.format("lance").load(path)
    assert out.columns == ["id", "g", "tag"]
    assert out.count() == 11 and out.filter("tag IS NULL").count() == 10
    mf = LF.read_native_manifest(path)
    ids = {f.name: f.id for f in mf.fields if f.parent == -1}
    assert ids["tag"] > max(ids["id"], ids["g"])
