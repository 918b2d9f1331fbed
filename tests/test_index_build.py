"""Emulated IVF index: build (distributed Lloyd k-means, persisted
centroids + assignments), indexed search (probe nprobes cells only),
replace-flag semantics, and exactness when probing every cell."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.index import (
    build_index,
    has_index,
    ivf_index_knn,
)
from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.knn import knn
from flink_connector_lance_spark.options import DatasetOptions
from flink_connector_lance_spark.queries.knn import QVEC
from flink_connector_lance_spark.sources.writer import write_dataset


@pytest.fixture(scope="module")
def indexed_ds(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    opts = DatasetOptions(path=path, index_num_partitions=8)
    res = build_index(path, "embedding", "ivf_flat", spark=spark,
                      id_col="vec_id", options=opts)
    assert res.success, res.error
    return path


def test_index_layout_on_disk(indexed_ds):
    path = indexed_ds
    assert has_index(path, "embedding")
    base = os.path.join(path, "_indexes", "embedding", "ivf")
    assert os.path.exists(os.path.join(base, "centroids.parquet"))
    assert os.path.exists(os.path.join(base, "assignments.parquet"))
    assert os.path.exists(os.path.join(base, "index_meta.json"))


def test_replace_flag_semantics(spark, indexed_ds):
    # ref LanceIndexBuilder.java:173-179: existing index + replace=False -> error
    res = build_index(indexed_ds, "embedding", "ivf_flat", spark=spark, id_col="vec_id")
    assert not res.success and "replace=True" in res.error
    res2 = build_index(indexed_ds, "embedding", "ivf_flat", spark=spark,
                       id_col="vec_id", replace=True,
                       options=DatasetOptions(path=indexed_ds, index_num_partitions=8))
    assert res2.success, res2.error


def test_missing_column_fails_cleanly(spark, indexed_ds):
    res = build_index(indexed_ds, "no_such_col", "ivf_flat", spark=spark,
                      id_col="vec_id", replace=True)
    assert not res.success and "no_such_col" in res.error


def test_indexed_search_prunes_and_full_probe_is_exact(spark, sf_dir, indexed_ds):
    path = indexed_ds
    # probing ALL cells must reproduce the exact brute-force top-k
    exact = knn(load_table(spark, sf_dir, "embeddings"), "embedding", QVEC,
                k=10, metric="l2", tiebreak_cols=["vec_id"], round_digits=6)
    exact_ids = [r.vec_id for r in exact.select("vec_id").collect()]
    full = ivf_index_knn(spark, path, "embedding", QVEC, k=10, nprobes=8,
                         tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in full.select("vec_id").collect()] == exact_ids
    # probing 1 cell returns k rows from a strict candidate subset
    one = ivf_index_knn(spark, path, "embedding", QVEC, k=10, nprobes=1,
                        tiebreak_cols=["vec_id"], round_digits=6)
    rows = one.collect()
    assert len(rows) == 10
    ds = [r._distance for r in rows]
    assert ds == sorted(ds)


def test_assignments_cover_every_row(spark, sf_dir, indexed_ds):
    assigns = spark.read.parquet(
        os.path.join(indexed_ds, "_indexes", "embedding", "ivf", "assignments.parquet")
    )
    n = load_table(spark, sf_dir, "embeddings").count()
    assert assigns.count() == n
    assert assigns.select("vec_id").distinct().count() == n
    n_cells = assigns.select("cell").distinct().count()
    assert 1 < n_cells <= 8

def test_probe_scan_prunes_partitions(spark, indexed_ds):
    """The nprobes cell filter must reach the cell-partitioned assignments
    scan as a partition filter — at scale, un-probed cells are never read."""
    import flink_connector_lance_spark.index as IX

    import re

    df = ivf_index_knn(spark, indexed_ds, "embedding", QVEC, k=5, nprobes=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("cell" in f for f in filters), plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_search_dataset_autoroutes_index_vs_brute_force(spark, sf_dir, indexed_ds):
    """search_dataset: the reference's useIndex contract — auto-detect
    routes through the IVF index; use_index=False is the exact baseline;
    full-probe indexed search equals it; filtered ANN narrows candidates."""
    from flink_connector_lance_spark.index import search_dataset

    path = indexed_ds
    exact = search_dataset(spark, path, "embedding", QVEC, k=10, metric="l2",
                           use_index=False, tiebreak_cols=["vec_id"], round_digits=6)
    exact_ids = [r.vec_id for r in exact.select("vec_id").collect()]

    # auto-detect with every cell probed reproduces the exact result
    auto = search_dataset(spark, path, "embedding", QVEC, k=10, metric="l2",
                          nprobes=8, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in auto.select("vec_id").collect()] == exact_ids
    # the auto route really is the indexed plan: the scan carries the
    # probed-cell partition filter from the assignments relation
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan

    # metric disagreement with the index is an error, not wrong distances
    import pytest as _pt

    with _pt.raises(ValueError, match="metric"):
        search_dataset(spark, path, "embedding", QVEC, k=10, metric="cosine")

    # filtered ANN: predicate applies before top-k (every surviving id even)
    filt = search_dataset(spark, path, "embedding", QVEC, k=5, metric="l2",
                          nprobes=8, filter="vec_id % 2 = 0",
                          tiebreak_cols=["vec_id"], round_digits=6)
    rows = filt.collect()
    assert len(rows) == 5 and all(r.vec_id % 2 == 0 for r in rows)


def test_search_dataset_without_index_is_brute_force(spark, sf_dir, tmp_path):
    from flink_connector_lance_spark.index import search_dataset

    path = str(tmp_path / "plain")
    write_dataset(load_table(spark, sf_dir, "embeddings"), path, mode="overwrite")
    out = search_dataset(spark, path, "embedding", QVEC, k=7, metric="cosine",
                         tiebreak_cols=["vec_id"], round_digits=6)
    rows = out.collect()
    assert len(rows) == 7
    ds = [r._distance for r in rows]
    assert ds == sorted(ds)
    # use_index=True on an un-indexed dataset fails fast
    import pytest as _pt

    with _pt.raises(FileNotFoundError):
        search_dataset(spark, path, "embedding", QVEC, use_index=True).collect()


def test_ivf_hnsw_pq_builds_all_three_halves(spark, sf_dir, tmp_path):
    """IVF_HNSW_PQ on the emulated backend builds the full trio: IVF
    cells + PQ codes + per-cell HNSW graphs (ref
    LanceIndexBuilder.java:140-157) — no degradation warning anymore."""
    import warnings

    from flink_connector_lance_spark import pq as pqmod
    from flink_connector_lance_spark.hnsw import has_hnsw_index
    from flink_connector_lance_spark.index import build_index, has_index
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = str(tmp_path / "ds")
    write_dataset(load_table(spark, sf_dir, "embeddings"), path, mode="overwrite")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = build_index(path, "embedding", index_type="ivf_hnsw_pq",
                          spark=spark, id_col="vec_id", replace=True,
                          options=DatasetOptions(path=path, index_num_partitions=4,
                                                 index_num_sub_vectors=8,
                                                 index_num_bits=4))
    assert res.success, res.error
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]
    assert has_index(path, "embedding") and pqmod.has_pq_index(path, "embedding")
    assert has_hnsw_index(path, "embedding")


def test_promotion_ids_deterministic_across_many_fragments(spark, tmp_path):
    """Thread-pooled staged-fragment promotion keeps fragment ids in
    sorted staging-file order regardless of completion order."""
    from flink_connector_lance_spark.options import DatasetOptions
    from flink_connector_lance_spark.sources.fragments import read_manifest
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = str(tmp_path / "ds")
    df = spark.range(0, 3000).selectExpr("id", "id % 7 AS label").coalesce(1)
    write_dataset(df, path, mode="overwrite",
                  options=DatasetOptions(path=path, write_max_rows_per_file=50))
    m = read_manifest(path)
    assert len(m.fragments) == 60
    assert [f.fragment_id for f in m.fragments] == list(range(60))
    assert sum(f.row_count for f in m.fragments) == 3000
    # coalesce(1) + maxRecordsPerFile splits sequentially: sorted staging
    # order preserves the global id order, so zone maps stay monotonic
    mins = [f.stats["id"]["min"] for f in m.fragments]
    assert mins == sorted(mins)
