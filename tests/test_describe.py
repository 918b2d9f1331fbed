"""describe_dataset (sources/maintenance.py): the one-call metadata
report — versions, stats, bloom coverage, index staleness, rollup
staleness, clustering layout — all from metadata, no Spark jobs after
setup."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.index import build_index
from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.options import DatasetOptions
from flink_connector_lance_spark.sources.datasource import register_lance_datasource
from flink_connector_lance_spark.sources.maintenance import cluster_dataset, describe_dataset
from flink_connector_lance_spark.sources.rollup import create_rollup
from flink_connector_lance_spark.sources.writer import write_dataset


def test_describe_full_surface(spark, sf_dir, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents")
    (
        d.write.format("lance").option("write.bloom-columns", "doc_id")
        .mode("overwrite").save(path)
    )
    n = d.count()
    create_rollup(spark, path, "by_lang", ["lang"], {"cnt": "count"})
    cluster_dataset(spark, path, by=["n_chars"])
    # the clustering rewrite dropped the blooms (new fragments) — append
    # a bloom'd tail so coverage is partial and visible as such
    d.limit(50).write.format("lance").option("write.bloom-columns", "doc_id").mode(
        "append").save(path)

    desc = describe_dataset(path)
    assert desc["num_rows"] == n + 50
    assert desc["version"] == 2
    assert desc["versions"] == [0, 1, 2]
    assert desc["bloom"]["columns"] == ["doc_id"]
    assert desc["bloom"]["fragments_covered"] >= 1
    assert desc["clustering"]["cluster_by"] == ["n_chars"]
    assert desc["clustering"]["unclustered_rows"] == 50  # the appended tail
    assert desc["rollups"][0]["name"] == "by_lang"
    assert desc["rollups"][0]["pending_rows"] > 0  # stale: appends after create
    assert desc["indexes"] == []
    assert "n_chars" in (desc["schema_columns"] or [])


def test_describe_reports_index_staleness(spark, sf_dir, tmp_path):
    path = str(tmp_path / "emb")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    res = build_index(path, "embedding", "ivf_flat", spark=spark, id_col="vec_id",
                      options=DatasetOptions(path=path, index_num_partitions=8))
    assert res.success, res.error
    assert describe_dataset(path)["indexes"][0]["unindexed_rows"] == 0
    write_dataset(e.limit(25), path, mode="append")
    idx = describe_dataset(path)["indexes"][0]
    assert idx["column"] == "embedding" and idx["unindexed_rows"] == 25


def test_describe_rejects_non_dataset(tmp_path):
    with pytest.raises(FileNotFoundError):
        describe_dataset(str(tmp_path / "nope"))
