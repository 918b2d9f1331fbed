"""Policy-driven auto-maintenance (sources/auto_maintenance.py): the
right passes fire for the right reasons, in order, and dry_run decides
without mutating."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.auto_maintenance import (
    MaintenancePolicy,
    run_maintenance,
)
from flink_connector_lance_spark.sources.datasource import register_lance_datasource
from flink_connector_lance_spark.sources.maintenance import cluster_dataset
from flink_connector_lance_spark.sources.rollup import create_rollup, rollup_status
from flink_connector_lance_spark.sources.writer import write_dataset


def _steps(report):
    return {s["step"]: s for s in report["steps"]}


def test_fresh_compacted_table_runs_nothing_but_vacuum(spark, tmp_path):
    path = str(tmp_path / "t")
    write_dataset(spark.range(1000).selectExpr("id", "id % 5 as g"),
                  path, mode="overwrite")
    rep = run_maintenance(spark, path, MaintenancePolicy(
        target_rows_per_fragment=100))
    s = _steps(rep)
    assert not s["compact"]["due"]  # no runts
    assert "cluster_tail" not in s  # never clustered: nothing to maintain
    assert s["vacuum"]["due"]


def test_runty_table_compacts_and_rollup_refreshes(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id", "id % 5 as g")
    df.coalesce(1).write.format("lance").mode("overwrite").save(path)
    create_rollup(spark, path, "by_g", ["g"], {"cnt": "count"})
    # micro-batch appends: lots of runts + rollup staleness
    for i in range(4):
        spark.range(100 * (i + 1), 100 * (i + 2)).selectExpr(
            "id", "id % 5 as g").coalesce(1).write.format("lance").mode(
            "append").save(path)
    pol = MaintenancePolicy(target_rows_per_fragment=1000, keep_versions=1)
    rep = run_maintenance(spark, path, pol)
    s = _steps(rep)
    assert s["compact"]["due"] and "new_version" in s["compact"]["result"]
    assert s["refresh_rollup:by_g"]["due"]
    # compaction rewrote covered fragments, so the refresh went full
    assert s["refresh_rollup:by_g"]["result"]["mode"] == "full"
    assert rollup_status(path, "by_g")["pending_rows"] == 0
    assert s["vacuum"]["result"]["dropped_versions"] >= 4
    # table intact after the whole pass
    assert spark.read.format("lance").load(path).count() == 500


def test_compaction_induced_staleness_handled_same_pass(spark, tmp_path):
    """The decisions after the compact step must see the POST-compaction
    snapshot: a rollup that was perfectly fresh before (zero pending
    rows) is flipped to needs_full by the compaction rewrite and must be
    refreshed in THIS pass, not the next cycle."""
    from flink_connector_lance_spark.sources.rollup import refresh_rollup

    register_lance_datasource(spark)
    path = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 50, (i + 1) * 50).selectExpr(
            "id", "id % 5 as g").coalesce(1).write.format("lance").mode(
            "overwrite" if i == 0 else "append").save(path)
    create_rollup(spark, path, "by_g", ["g"], {"cnt": "count"})
    assert rollup_status(path, "by_g")["pending_rows"] == 0  # fresh NOW
    rep = run_maintenance(spark, path, MaintenancePolicy(
        target_rows_per_fragment=1000, keep_versions=1))
    s = _steps(rep)
    assert s["compact"]["due"]
    assert s["refresh_rollup:by_g"]["due"], \
        "post-compaction needs_full was not seen in the same pass"
    assert s["refresh_rollup:by_g"]["result"]["mode"] == "full"
    st = rollup_status(path, "by_g")
    assert st["pending_rows"] == 0 and not st["needs_full"]


def test_cluster_tail_fires_when_tail_grows(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "t")
    df = spark.range(400).selectExpr("id", "id % 7 as v")
    df.repartition(2).write.format("lance").mode("overwrite").save(path)
    cluster_dataset(spark, path, by=["v"], target_rows_per_fragment=200)
    # append a tail > 20% of rows
    spark.range(400, 600).selectExpr("id", "id % 7 as v").coalesce(1).write.format(
        "lance").mode("append").save(path)
    rep = run_maintenance(spark, path, MaintenancePolicy(
        target_rows_per_fragment=200, keep_versions=1))
    s = _steps(rep)
    assert s["cluster_tail"]["due"]
    assert "new_version" in s["cluster_tail"]["result"]
    desc_tail = run_maintenance(spark, path, dry_run=True)
    assert not _steps(desc_tail).get("cluster_tail", {"due": False})["due"]
    assert spark.read.format("lance").load(path).count() == 600


def test_dry_run_mutates_nothing(spark, tmp_path):
    register_lance_datasource(spark)
    path = str(tmp_path / "t")
    for i in range(3):
        spark.range(i * 10, (i + 1) * 10).selectExpr("id", "id % 2 as g").coalesce(
            1).write.format("lance").mode("overwrite" if i == 0 else "append").save(path)
    v_before = FR.latest_version(path)
    rep = run_maintenance(spark, path, MaintenancePolicy(
        target_rows_per_fragment=100, keep_versions=1), dry_run=True)
    assert rep["dry_run"]
    assert FR.latest_version(path) == v_before  # nothing committed
    assert all("result" not in s for s in rep["steps"])
    assert _steps(rep)["compact"]["due"]  # it still DECIDED correctly
