"""Dataset source/sink/catalog/streaming tests on the parquet-fragment
emulation backend (the lance native path is import-gated; architecture is
identical — executor fragment writes + driver single commit)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from flink_connector_lance_spark.index import IndexBuildResult, build_index
from flink_connector_lance_spark.options import DatasetOptions
from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.catalog import CatalogError, DatasetCatalog, Unsupported
from flink_connector_lance_spark.sources.reader import count_rows, read_dataset
from flink_connector_lance_spark.sources.writer import write_dataset
from flink_connector_lance_spark.streaming.sink import commit_epoch, epoch_committed


@pytest.fixture()
def ds_path(tmp_path):
    return str(tmp_path / "dataset")


def _sample(spark, n=100, parts=4):
    return (
        spark.range(n).repartition(parts)
        .select(F.col("id"), (F.col("id") % 5).alias("grp"),
                (F.col("id") * 1.5).alias("val"))
    )


class TestWriteRead:
    def test_write_then_read_roundtrip(self, spark, ds_path):
        df = _sample(spark)
        manifest = write_dataset(df, ds_path, mode="append")
        assert manifest.version == 0
        assert manifest.row_count == 100
        assert FR.is_dataset(ds_path)
        out = read_dataset(spark, ds_path)
        assert out.count() == 100
        assert set(out.columns) == {"id", "grp", "val"}

    def test_fragments_follow_partitions(self, spark, ds_path):
        write_dataset(_sample(spark, 100, parts=4), ds_path)
        m = FR.read_manifest(ds_path)
        assert len(m.fragments) == 4  # one fragment per executor partition

    def test_append_creates_new_version(self, spark, ds_path):
        write_dataset(_sample(spark, 50), ds_path)
        m2 = write_dataset(_sample(spark, 30), ds_path, mode="append")
        assert m2.version == 1
        assert m2.row_count == 80
        assert read_dataset(spark, ds_path).count() == 80
        # MVCC: old version still readable
        assert read_dataset(spark, ds_path, version=0).count() == 50

    def test_overwrite_replaces_fragments(self, spark, ds_path):
        write_dataset(_sample(spark, 50), ds_path)
        m2 = write_dataset(_sample(spark, 20), ds_path, mode="overwrite")
        assert m2.row_count == 20
        assert read_dataset(spark, ds_path).count() == 20
        assert read_dataset(spark, ds_path, version=0).count() == 50

    def test_max_rows_per_file(self, spark, ds_path):
        opts = DatasetOptions(path=ds_path, write_max_rows_per_file=10)
        write_dataset(_sample(spark, 100, parts=2), ds_path, options=opts)
        m = FR.read_manifest(ds_path)
        assert all(f.row_count <= 10 for f in m.fragments)
        assert m.row_count == 100

    def test_pushdowns(self, spark, ds_path):
        write_dataset(_sample(spark), ds_path)
        out = read_dataset(spark, ds_path, columns=["id", "grp"],
                           filter=F.col("grp") == 2, limit=5)
        rows = out.collect()
        assert len(rows) == 5
        assert set(out.columns) == {"id", "grp"}
        assert all(r.grp == 2 for r in rows)

    def test_filter_string_and_configured_filter_compose(self, spark, ds_path):
        write_dataset(_sample(spark), ds_path)
        opts = DatasetOptions(path=ds_path, read_filter="grp = 2")
        out = read_dataset(spark, ds_path, filter="id >= 50", options=opts)
        assert out.count() == _sample(spark).filter("grp = 2 AND id >= 50").count()

    def test_limit_zero(self, spark, ds_path):
        write_dataset(_sample(spark), ds_path)
        assert read_dataset(spark, ds_path, limit=0).count() == 0

    def test_count_rows_metadata_only(self, spark, ds_path):
        write_dataset(_sample(spark, 77), ds_path)
        assert count_rows(ds_path) == 77

    def test_read_missing_dataset_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_dataset(spark, str(tmp_path / "nope"))

    def test_commit_conflict_retry(self, spark, ds_path):
        write_dataset(_sample(spark, 10), ds_path)
        # simulate a concurrent writer stealing version 1
        FR.commit(ds_path, [], mode="append")
        m = write_dataset(_sample(spark, 10), ds_path, mode="append")
        assert m.version == 2
        assert read_dataset(spark, ds_path).count() == 20


class TestCatalog:
    def test_lifecycle(self, spark, tmp_path):
        cat = DatasetCatalog(str(tmp_path / "wh"))
        assert cat.list_databases() == ["default"]
        cat.create_database("db1")
        assert cat.database_exists("db1")
        with pytest.raises(CatalogError):
            cat.create_database("db1")
        cat.create_database("db1", ignore_if_exists=True)

        write_dataset(_sample(spark, 10), cat.table_location("db1", "t1"))
        assert cat.list_tables("db1") == ["t1"]
        assert cat.table_exists("db1", "t1")
        assert cat.get_table(spark, "db1", "t1").count() == 10

        cat.rename_table("db1", "t1", "t2")
        assert cat.list_tables("db1") == ["t2"]

        with pytest.raises(CatalogError):
            cat.drop_database("db1")  # not empty, no cascade
        cat.drop_database("db1", cascade=True)
        assert not cat.database_exists("db1")

    def test_register_table_enables_sql(self, spark, tmp_path):
        cat = DatasetCatalog(str(tmp_path / "wh"))
        write_dataset(_sample(spark, 20), cat.table_location("default", "t"))
        cat.register_table(spark, "default", "t", view_name="cat_t")
        got = spark.sql("SELECT grp, count(*) AS c FROM cat_t GROUP BY grp ORDER BY grp")
        assert got.count() == 5

    def test_non_dataset_dir_not_listed(self, spark, tmp_path):
        cat = DatasetCatalog(str(tmp_path / "wh"))
        os.makedirs(os.path.join(cat.warehouse, "default", "notatable"))
        assert cat.list_tables() == []  # detection by _versions/ only

    def test_refusals_match_reference(self, tmp_path):
        cat = DatasetCatalog(str(tmp_path / "wh"))
        with pytest.raises(Unsupported):
            cat.alter_table("default", "t")
        with pytest.raises(Unsupported):
            cat.create_function("f")
        with pytest.raises(Unsupported):
            cat.list_partitions("default", "t")
        assert cat.get_table_statistics("default", "t") is None


class TestStreamingSink:
    def test_epoch_idempotent_commit(self, spark, ds_path):
        b1 = _sample(spark, 10)
        m = commit_epoch(b1, 0, ds_path)
        assert m is not None and m.row_count == 10
        assert epoch_committed(ds_path, 0)
        # redelivery of epoch 0 must be a no-op
        assert commit_epoch(b1, 0, ds_path) is None
        assert read_dataset(spark, ds_path).count() == 10
        # next epoch appends
        commit_epoch(_sample(spark, 5), 1, ds_path)
        assert read_dataset(spark, ds_path).count() == 15

    def test_foreach_batch_stream(self, spark, ds_path, tmp_path):
        from flink_connector_lance_spark.streaming.sink import stream_write_dataset

        stream = (
            spark.readStream.format("rate").option("rowsPerSecond", "50")
            .option("numPartitions", "2").load()
            .select(F.col("value").alias("id"), (F.col("value") % 5).alias("grp"),
                    (F.col("value") * 1.5).alias("val"))
        )
        q = stream_write_dataset(stream, ds_path, str(tmp_path / "ckpt"),
                                 trigger_available_now=True)
        q.awaitTermination(60)
        assert FR.is_dataset(ds_path)
        assert read_dataset(spark, ds_path).count() >= 0  # rate source may emit 0 in availableNow
        assert os.path.isdir(os.path.join(ds_path, "_epochs"))


class TestIndexBuilder:
    def test_build_without_lance_reports_failure(self, ds_path, spark):
        write_dataset(_sample(spark, 10), ds_path)
        res = build_index(ds_path, "val", "ivf_pq", "l2")
        assert isinstance(res, IndexBuildResult)
        assert res.success is False
        assert "lance" in res.error
        assert res.duration_seconds >= 0

    def test_bad_index_type_raises(self, ds_path):
        with pytest.raises(ValueError):
            build_index(ds_path, "v", "btree", "l2")
