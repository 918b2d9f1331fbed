"""Data-layout clustering (cluster_dataset): sort/Z-order rewrites that
make the manifest zone maps selective, so pushed filters prune fragments."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.datasource import (
    GreaterThan,
    LanceDataSourceReader,
    LessThan,
    register_lance_datasource,
)
from flink_connector_lance_spark.sources.maintenance import cluster_dataset


@pytest.fixture()
def registered(spark):
    register_lance_datasource(spark)
    return spark


def _planned(path, filters):
    r = LanceDataSourceReader({"path": path})
    r.pushFilters(list(filters))
    return r.partitions()


def test_cluster_by_makes_zone_maps_selective(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    # write documents UN-clustered w.r.t. n_chars (doc_id order), 8 fragments:
    # every fragment spans nearly the full n_chars range -> no pruning
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    n = d.count()
    per_frag = -(-n // 8)
    d.repartitionByRange(8, "doc_id").write.format("lance").mode("overwrite").save(path)
    assert len(FR.read_manifest(path).fragments) == 8
    narrow = [GreaterThan(("n_chars",), 100), LessThan(("n_chars",), 120)]
    before = len(_planned(path, narrow))
    assert before == 8  # random layout: every fragment may match

    m = cluster_dataset(spark, path, by=["n_chars"], target_rows_per_fragment=per_frag)
    assert m.meta["clustering"]["cluster_by"] == ["n_chars"]
    assert sum(f.row_count for f in m.fragments) == n  # rewrite preserves rows
    after = len(_planned(path, narrow))
    assert after <= 2, f"clustered layout should prune to <=2 fragments, got {after}"

    # results identical pre/post (old version still readable: MVCC)
    df = spark.read.format("lance").load(path)
    got = df.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    want = d.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    assert got == want
    prev = spark.read.format("lance").option("version", m.version - 1).load(path)
    assert prev.count() == n


def test_zorder_prunes_on_both_columns(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = d.count()
    d.repartitionByRange(8, "doc_id").write.format("lance").mode("overwrite").save(path)
    # doc_id-ordered layout: n_chars zone maps are mostly unselective
    before_nchars = len(_planned(path, [LessThan(("n_chars",), 60)]))

    m = cluster_dataset(spark, path, by=["doc_id", "n_chars"],
                        target_rows_per_fragment=-(-n // 8), zorder=True)
    assert m.meta["clustering"]["zorder"] == ["doc_id", "n_chars"]
    assert sum(f.row_count for f in m.fragments) == n
    # after z-order BOTH single-column range filters prune fragments
    frags = len(m.fragments)
    assert len(_planned(path, [LessThan(("doc_id",), 20)])) < frags
    after_nchars = len(_planned(path, [LessThan(("n_chars",), 60)]))
    assert after_nchars < frags and after_nchars <= before_nchars
    # and results stay exact
    df = spark.read.format("lance").load(path)
    assert df.filter(F.col("n_chars") < 60).count() == \
        d.filter(F.col("n_chars") < 60).count()


def test_cluster_requires_columns_and_fragments(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    load_table(spark, sf_dir, "documents").limit(10).write.format("lance").mode(
        "overwrite").save(path)
    with pytest.raises(ValueError, match="column"):
        cluster_dataset(spark, path, by=[])


def test_delete_rows_copy_on_write(registered, tmp_path, sf_dir):
    import os

    from flink_connector_lance_spark.sources.maintenance import delete_rows

    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    n = d.count()
    # range-disjoint fragments on doc_id so the delete touches a subset
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    m0 = FR.read_manifest(path)
    victims = d.filter("doc_id < 10").count()
    assert 0 < victims < n

    m1 = delete_rows(spark, path, "doc_id < 10")
    assert m1.version == m0.version + 1
    assert sum(f.row_count for f in m1.fragments) == n - victims
    # untouched fragments carry over as the SAME files (true copy-on-write)
    old_files = {f.file for f in m0.fragments}
    kept = [f for f in m1.fragments if f.file in old_files]
    assert len(kept) >= 2, "range-disjoint fragments without matches must survive as-is"

    df = spark.read.format("lance").load(path)
    assert df.count() == n - victims
    assert df.filter("doc_id < 10").count() == 0
    # time travel across the delete still sees the old rows
    prev = spark.read.format("lance").option("version", m0.version).load(path)
    assert prev.count() == n

    # deleting nothing is a no-op: no new version
    m2 = delete_rows(spark, path, "doc_id < 0")
    assert m2.version == m1.version

    # deleting everything in the remaining matched fragments works too
    m3 = delete_rows(spark, path, "doc_id >= 0")
    assert m3.version == m1.version + 1
    assert sum(f.row_count for f in m3.fragments) == 0 or not m3.fragments


def test_merge_rows_upserts_in_one_commit(registered, tmp_path, sf_dir):
    from flink_connector_lance_spark.sources.maintenance import merge_rows

    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    n = d.count()
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    m0 = FR.read_manifest(path)

    # update 5 existing keys (new n_chars) + insert 3 brand-new keys
    updates = spark.createDataFrame(
        [(i, -1, "xx") for i in range(5)] +
        [(10_000 + i, -2, "yy") for i in range(3)],
        "doc_id long, n_chars int, lang string",
    )
    m1 = merge_rows(spark, path, updates, key="doc_id")
    assert m1.version == m0.version + 1
    assert sum(f.row_count for f in m1.fragments) == n + 3

    df = spark.read.format("lance").load(path)
    assert df.count() == n + 3
    assert df.filter("doc_id < 5").agg({"n_chars": "max"}).first()[0] == -1  # updated
    assert df.filter("doc_id >= 10000").count() == 3                         # inserted
    assert df.filter("lang = 'xx'").count() == 5
    # untouched fragments carried over as the same files
    old_files = {f.file for f in m0.fragments}
    assert any(f.file in old_files for f in m1.fragments)
    # old version untouched (atomic swap, no intermediate state)
    prev = spark.read.format("lance").option("version", m0.version).load(path)
    assert prev.count() == n and prev.filter("lang = 'xx'").count() == 0

    # merging only-new keys = pure insert, still one commit
    m2 = merge_rows(spark, path,
                    spark.createDataFrame([(20_000, 7, "zz")],
                                          "doc_id long, n_chars int, lang string"),
                    key="doc_id")
    assert m2.version == m1.version + 1
    assert spark.read.format("lance").load(path).count() == n + 4


def test_tail_clustering_sorts_only_new_fragments(registered, tmp_path, sf_dir):
    """LSM-style incremental clustering: a tail pass rewrites only the
    fragments added since the last clustering commit; clustered
    fragments carry over byte-identical."""
    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    n = d.count()
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    m0 = cluster_dataset(spark, path, by=["n_chars"],
                         target_rows_per_fragment=-(-n // 8))
    clustered_files = {f.file for f in m0.fragments}

    # append an UN-clustered tail (n_chars spans the full range)
    tail = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    tail.coalesce(2).write.format("lance").mode("append").save(path)

    m1 = cluster_dataset(spark, path, by=["n_chars"],
                         target_rows_per_fragment=-(-n // 8), scope="tail")
    assert m1.meta["clustering"]["scope"] == "tail"
    # every originally clustered fragment survives untouched
    assert clustered_files <= {f.file for f in m1.fragments}
    # the tail was rewritten: its unsorted fragments are gone
    assert sum(f.row_count for f in m1.fragments) == 2 * n
    # the table still reads correctly and the tail run prunes: a narrow
    # n_chars range keeps only a bounded number of fragments per run
    narrow = [GreaterThan(("n_chars",), 100), LessThan(("n_chars",), 120)]
    kept = len(_planned(path, narrow))
    assert kept <= 4, f"expected <=2 fragments kept per sorted run, got {kept}"
    got = spark.read.format("lance").load(path).filter(
        (F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    want = 2 * d.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    assert got == want


def test_tail_clustering_noops_when_nothing_new(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    m0 = cluster_dataset(spark, path, by=["n_chars"])
    v0 = FR.latest_version(path)
    m1 = cluster_dataset(spark, path, by=["n_chars"], scope="tail")
    assert FR.latest_version(path) == v0  # no new commit
    assert {f.file for f in m1.fragments} == {f.file for f in m0.fragments}


def test_tail_scope_without_prior_clustering_sorts_everything(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    m = cluster_dataset(spark, path, by=["n_chars"], scope="tail")
    assert m.meta["clustering"]["scope"] == "tail"
    assert sum(f.row_count for f in m.fragments) == d.count()


def test_invalid_scope_rejected(registered, tmp_path, sf_dir):
    spark = registered
    path = str(tmp_path / "ds")
    load_table(spark, sf_dir, "documents").select("doc_id").write.format(
        "lance").mode("overwrite").save(path)
    with pytest.raises(ValueError, match="scope"):
        cluster_dataset(spark, path, by=["doc_id"], scope="partial")


# --- ingest-time layout: write.sort-by / write.cluster ----------------------

def test_clustered_write_prunes_without_rewrite(registered, tmp_path, sf_dir):
    """write.cluster=true lays fragments out with disjoint key ranges at
    ingest, so zone maps prune immediately — no cluster_dataset rewrite
    of the same bytes afterward."""
    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.writer import write_dataset

    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "lang")
    # fragment granularity via max-rows-per-file: sequential splits of a
    # range-sorted partition keep disjoint key ranges (AQE may coalesce
    # the tiny range shuffle to one partition at this scale)
    per_frag = -(-d.count() // 8)
    opts = DatasetOptions(path=path, sort_columns=["n_chars"],
                          cluster_on_write=True, write_max_rows_per_file=per_frag)
    write_dataset(d.repartition(8, "doc_id"), path, mode="overwrite", options=opts)
    narrow = [GreaterThan(("n_chars",), 100), LessThan(("n_chars",), 120)]
    total = len(FR.read_manifest(path).fragments)
    assert total >= 2
    planned = len(_planned(path, narrow))
    assert planned <= 2, f"clustered write should prune to <=2, got {planned}/{total}"
    # rows intact and filter results exact
    df = spark.read.format("lance").load(path)
    assert df.count() == d.count()
    got = df.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    want = d.filter((F.col("n_chars") > 100) & (F.col("n_chars") < 120)).count()
    assert got == want


def test_sort_by_orders_rows_within_fragments(registered, tmp_path, sf_dir):
    """write.sort-by alone (zero shuffle) orders rows inside each
    fragment so parquet row-group stats are monotone."""
    import pyarrow.parquet as papq
    import os as _os

    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.writer import write_dataset

    spark = registered
    path = str(tmp_path / "ds")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    write_dataset(d.repartition(4, "doc_id"), path, mode="overwrite",
                  options=DatasetOptions(path=path, sort_columns=["n_chars"]))
    m = FR.read_manifest(path)
    for f in m.fragments:
        vals = papq.read_table(_os.path.join(path, f.file),
                               columns=["n_chars"])["n_chars"].to_pylist()
        assert vals == sorted(vals), f.file


def test_write_sort_options_validation(spark, tmp_path, sf_dir):
    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = str(tmp_path / "ds")
    with pytest.raises(ValueError, match="write.cluster=true requires"):
        DatasetOptions(path=path, cluster_on_write=True)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    with pytest.raises(ValueError, match="not in batch"):
        write_dataset(d, path, mode="overwrite",
                      options=DatasetOptions(path=path, sort_columns=["nope"]))
    # option-map spellings parse like every other connector option
    o = DatasetOptions.from_dict({"path": path, "write.sort-by": "a, b",
                                  "write.cluster": "true"})
    assert o.sort_columns == ["a", "b"] and o.cluster_on_write is True


def test_format_writer_refuses_layout_options(registered, tmp_path, sf_dir):
    """The Python DataSource writer can't reshape its input plan, so the
    layout options refuse loudly instead of silently not clustering."""
    spark = registered
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    with pytest.raises(Exception, match="write.sort-by / write.cluster"):
        (d.write.format("lance").option("write.sort-by", "n_chars")
         .mode("overwrite").save(str(tmp_path / "x")))


def test_format_writer_accepts_falsey_layout_spellings(registered, tmp_path, sf_dir):
    """.option('write.cluster', 'false') means OFF, not a refusal."""
    spark = registered
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    p = str(tmp_path / "x")
    (d.write.format("lance").option("write.cluster", "false")
     .option("write.sort-by", "").mode("overwrite").save(p))
    assert spark.read.format("lance").load(p).count() == d.count()


def test_native_tail_and_zorder_clustering(spark, tmp_path):
    """Tail-scope and z-order clustering on a NATIVE binary dataset: the
    clustering meta rides in the table-config slot, so an incremental
    pass re-sorts only the fragments appended since the last run, and
    z-order bounds come from the native stats sidecar."""
    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.sources.maintenance import (
        _last_clustering_files_native,
        cluster_dataset,
    )
    from flink_connector_lance_spark.sources.writer import write_native_pure

    path = str(tmp_path / "nds")
    df = spark.range(600).selectExpr("id", "id % 40 AS a", "id % 7 AS b")
    write_native_pure(df.repartition(3), path, mode="overwrite")

    m1 = cluster_dataset(spark, path, ["a", "b"], 200, zorder=True)
    files_after_full = {fr.file for fr in m1.fragments}
    assert _last_clustering_files_native(path) == files_after_full
    # incremental: append a runt, tail pass touches ONLY the new rows
    write_native_pure(
        spark.range(600, 650).selectExpr("id", "id % 40 AS a", "id % 7 AS b")
        .coalesce(1), path, mode="append")
    m2 = cluster_dataset(spark, path, ["a", "b"], 200, zorder=True,
                         scope="tail")
    kept = {fr.file for fr in m2.fragments} & files_after_full
    assert kept == files_after_full  # clustered run carried byte-identical
    assert sum(fr.physical_rows for fr in m2.fragments) == 650
    # a second tail pass with nothing new is a no-op (no new version)
    assert cluster_dataset(spark, path, ["a", "b"], 200, zorder=True,
                           scope="tail").version == m2.version
    # rows survived both passes
    from flink_connector_lance_spark.sources.reader import read_dataset

    assert read_dataset(spark, path).count() == 650
