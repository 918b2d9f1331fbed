"""Emulated IVF_PQ index: codebook training, code encoding, ADC search,
IVF composition, and search_dataset routing."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from flink_connector_lance_spark import pq
from flink_connector_lance_spark.index import build_index, has_index
from flink_connector_lance_spark.index import search_dataset
from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.knn import knn
from flink_connector_lance_spark.queries.knn import QVEC
from flink_connector_lance_spark.sources.writer import write_dataset


@pytest.fixture(scope="module")
def dataset(spark, sf_dir):
    path = os.path.join(tempfile.gettempdir(), "fcls_test_pq_ds")
    shutil.rmtree(path, ignore_errors=True)
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    yield path, e
    shutil.rmtree(path, ignore_errors=True)


def _ensure_ivf_pq(spark, path):
    if not (has_index(path, "embedding") and pq.has_pq_index(path, "embedding")):
        res = build_index(path, "embedding", index_type="ivf_pq", spark=spark,
                          id_col="vec_id", replace=True)
        assert res.success, res.error


def test_build_writes_codebooks_and_codes(spark, dataset):
    path, e = dataset
    meta = pq.build_pq_index(spark, path, "embedding", id_col="vec_id",
                             num_sub_vectors=8, num_bits=4, replace=True)
    assert meta["num_sub_vectors"] == 8 and meta["dim"] == 64
    idx = os.path.join(path, "_indexes", "embedding", "pq")
    books = spark.read.parquet(os.path.join(idx, "codebooks.parquet"))
    # 8 sub-spaces x up to 16 codes, centroids of sub-dim 8
    assert books.count() == 8 * 16
    first = books.first()
    assert len(first.centroid) == 8
    codes = spark.read.parquet(os.path.join(idx, "codes.parquet"))
    assert codes.count() == e.count()
    row = codes.first()
    assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)


def test_adc_refine_matches_exact_topk(spark, dataset):
    path, e = dataset
    pq.build_pq_index(spark, path, "embedding", id_col="vec_id",
                      num_sub_vectors=16, num_bits=8, iterations=2, replace=True)
    exact = knn(e, "embedding", QVEC, k=10, tiebreak_cols=["vec_id"],
                round_digits=6).select("vec_id", "_distance").collect()
    got = pq.pq_search(spark, path, "embedding", QVEC, k=10, refine_factor=10,
                       tiebreak_cols=["vec_id"], round_digits=6
                       ).select("vec_id", "_distance").collect()
    assert [(r.vec_id, r._distance) for r in got] == \
        [(r.vec_id, r._distance) for r in exact]


def test_refine_window_caps_candidate_fetch(spark, dataset):
    path, _ = dataset
    _ensure_ivf_pq(spark, path)
    # refine_factor=1: at most k rows are fetched for the exact re-rank
    out = pq.pq_search(spark, path, "embedding", QVEC, k=5, refine_factor=1,
                       tiebreak_cols=["vec_id"])
    assert out.count() == 5


def test_build_index_ivf_pq_builds_both_halves(spark, dataset):
    path, _ = dataset
    res = build_index(path, "embedding", index_type="ivf_pq", spark=spark,
                      id_col="vec_id", replace=True)
    assert res.success, res.error
    assert has_index(path, "embedding")        # IVF coarse half
    assert pq.has_pq_index(path, "embedding")  # PQ half
    meta = json.load(open(os.path.join(path, "_indexes", "embedding", "pq",
                                       "index_meta.json")))
    # reference defaults: 16 sub-vectors x 8 bits (config/LanceOptions.java)
    assert meta["num_sub_vectors"] == 16 and meta["num_bits"] == 8


def test_search_dataset_routes_to_pq_and_composes_ivf(spark, dataset):
    path, e = dataset
    _ensure_ivf_pq(spark, path)
    # both halves exist: search_dataset must take the PQ path
    got = search_dataset(spark, path, "embedding", QVEC, k=10,
                         tiebreak_cols=["vec_id"], round_digits=6
                         ).select("vec_id", "_distance").collect()
    exact = knn(e, "embedding", QVEC, k=10, tiebreak_cols=["vec_id"],
                round_digits=6).select("vec_id", "_distance").collect()
    assert [(r.vec_id, r._distance) for r in got] == \
        [(r.vec_id, r._distance) for r in exact]
    # nprobes restricts the ADC scan to probed cells: few probes can
    # legitimately surface fewer than k candidates; probing every cell
    # recovers the unpruned result exactly
    pruned = pq.pq_search(spark, path, "embedding", QVEC, k=10, refine_factor=10,
                          nprobes=4, tiebreak_cols=["vec_id"])
    assert 0 < pruned.count() <= 10
    all_cells = pq.pq_search(spark, path, "embedding", QVEC, k=10, refine_factor=10,
                             nprobes=10**6, tiebreak_cols=["vec_id"], round_digits=6
                             ).select("vec_id", "_distance").collect()
    assert [(r.vec_id, r._distance) for r in all_cells] == \
        [(r.vec_id, r._distance) for r in exact]


def test_metric_mismatch_raises(spark, dataset):
    path, _ = dataset
    _ensure_ivf_pq(spark, path)
    with pytest.raises(ValueError, match="metric"):
        search_dataset(spark, path, "embedding", QVEC, k=5, metric="cosine")


def test_query_dim_mismatch_raises(spark, dataset):
    path, _ = dataset
    _ensure_ivf_pq(spark, path)
    with pytest.raises(ValueError, match="dim"):
        pq.pq_search(spark, path, "embedding", [1.0, 2.0], k=5)


def test_index_survives_appends_and_deletes(spark, sf_dir):
    """Staleness contract: rows appended after the index build are still
    found (unindexed-tail scan); deleted rows vanish from results; the
    index keeps accelerating the covered fraction."""
    import pyspark.sql.functions as F

    from flink_connector_lance_spark.index import ivf_index_knn, split_by_index_coverage
    from flink_connector_lance_spark.sources.maintenance import delete_rows

    path = os.path.join(tempfile.gettempdir(), "fcls_pq_stale")
    shutil.rmtree(path, ignore_errors=True)
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    build_index(path, "embedding", index_type="ivf_pq", spark=spark,
                id_col="vec_id", replace=True)
    meta = json.load(open(os.path.join(path, "_indexes", "embedding", "pq",
                                       "index_meta.json")))

    # append a synthetic row that is the exact query vector: it MUST be
    # the new top-1 even though the index has never seen it
    probe = spark.createDataFrame(
        [(999_999, [float(v) for v in QVEC], 0)],
        "vec_id long, embedding array<double>, label int",
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    write_dataset(probe, path, mode="append")

    covered, uncovered = split_by_index_coverage(path, meta["dataset_version"])
    assert covered and uncovered, "append must create an unindexed tail"

    top_pq = pq.pq_search(spark, path, "embedding", QVEC, k=3, refine_factor=10,
                          tiebreak_cols=["vec_id"]).select("vec_id").collect()
    assert top_pq[0].vec_id == 999_999
    top_ivf = ivf_index_knn(spark, path, "embedding", QVEC, k=3, nprobes=4,
                            tiebreak_cols=["vec_id"]).select("vec_id").collect()
    assert top_ivf[0].vec_id == 999_999

    # delete it again: it must disappear without an index rebuild
    delete_rows(spark, path, "vec_id = 999999")
    after = pq.pq_search(spark, path, "embedding", QVEC, k=3, refine_factor=10,
                         tiebreak_cols=["vec_id"]).select("vec_id").collect()
    assert all(r.vec_id != 999_999 for r in after)
    shutil.rmtree(path, ignore_errors=True)


def test_vacuum_pins_index_manifest_and_refresh_rebuilds(spark, sf_dir):
    import pyspark.sql.functions as F

    from flink_connector_lance_spark.index import refresh_index, split_by_index_coverage
    from flink_connector_lance_spark.sources.maintenance import vacuum_dataset

    path = os.path.join(tempfile.gettempdir(), "fcls_pq_vacuum")
    shutil.rmtree(path, ignore_errors=True)
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")                      # v0
    build_index(path, "embedding", index_type="ivf_pq", spark=spark,
                id_col="vec_id", replace=True)                     # indexed @ v0
    n = e.count()
    small = e.limit(20).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    write_dataset(small, path, mode="append")                      # v1
    write_dataset(small.withColumn("vec_id", F.col("vec_id") + 1_000_000),
                  path, mode="append")                             # v2

    # vacuum keep_versions=1 would normally drop v0/v1 — the indexed
    # manifest (v0) must be pinned so coverage survives
    res = vacuum_dataset(path, keep_versions=1)
    assert 0 in res["kept_versions"]
    covered, uncovered = split_by_index_coverage(path, 0)
    assert covered, "index coverage must survive vacuum"
    assert uncovered, "appended fragments are the unindexed tail"

    # fresh enough at 40-row tail / n+40 total only if fraction <= 0.2 is
    # false here (40/(n+40) small for sf0.01's 500 rows -> ~0.074): None
    assert refresh_index(path, "embedding", spark=spark) is None
    # with a strict threshold the rebuild triggers and covers everything
    res2 = refresh_index(path, "embedding", spark=spark, max_uncovered_fraction=0.01)
    assert res2 is not None and res2.success, res2 and res2.error
    covered2, uncovered2 = split_by_index_coverage(
        path, __import__("json").load(open(os.path.join(
            path, "_indexes", "embedding", "pq", "index_meta.json")))["dataset_version"])
    assert not uncovered2
    shutil.rmtree(path, ignore_errors=True)


def test_adc_lut_survives_dropped_codebook_entries(spark, tmp_path):
    """Lloyd updates drop codebook entries that become empty, leaving
    non-contiguous code ids; the ADC LUT must be indexed by code VALUE,
    not compressed positionally (which mis-addresses or overruns)."""
    import pyspark.sql.functions as F

    base = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.0, 10.0], [20.0, 20.0, 20.0, 20.0]]
    # 3 distinct vectors spread over 20 rows; the first 8 rows seed k=8
    # codes, duplicates collapse on assignment -> surviving codes have gaps
    pat = [0, 0, 1, 0, 2, 0, 0, 0] + [i % 3 for i in range(12)]
    rows = [(i, base[pat[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    path = str(tmp_path / "ds")
    write_dataset(df, path, mode="overwrite")

    pq.build_pq_index(spark, path, "embedding", id_col="id",
                      num_sub_vectors=2, num_bits=3, iterations=2, replace=True)
    books = spark.read.parquet(
        os.path.join(path, "_indexes", "embedding", "pq", "codebooks.parquet"))
    per_sub = books.groupBy("sub").agg(
        F.max("code").alias("mx"), F.count(F.lit(1)).alias("n")).collect()
    assert any(r.mx + 1 > r.n for r in per_sub), \
        "setup should produce non-contiguous code ids"

    got = pq.pq_search(spark, path, "embedding", [0.0, 0.0, 0.0, 0.0],
                       k=5, refine_factor=2, tiebreak_cols=["id"]).collect()
    want = knn(df, "embedding", [0.0, 0.0, 0.0, 0.0], k=5,
               tiebreak_cols=["id"]).collect()
    assert [r.id for r in got] == [r.id for r in want]
    assert [round(r._distance, 6) for r in got] == \
        [round(r._distance, 6) for r in want]


def test_pq_search_ef_bounds_candidate_pool(spark, dataset):
    """vector.ef caps the ADC refine pool on the DataFrame path: with
    ef=k the pool is exactly the ADC top-k, regardless of refine_factor —
    so a huge refine_factor with ef=k must equal refine_factor=1."""
    path, e = dataset
    _ensure_ivf_pq(spark, path)
    narrow = pq.pq_search(spark, path, "embedding", QVEC, k=10,
                          refine_factor=50, ef=10, tiebreak_cols=["vec_id"])
    base = pq.pq_search(spark, path, "embedding", QVEC, k=10,
                        refine_factor=1, tiebreak_cols=["vec_id"])
    assert [r.vec_id for r in narrow.collect()] == [r.vec_id for r in base.collect()]
    with pytest.raises(ValueError):
        pq.pq_search(spark, path, "embedding", QVEC, k=5, ef=-1)
    # search_dataset resolves ef from DatasetOptions
    from flink_connector_lance_spark.options import DatasetOptions

    via_opts = search_dataset(
        spark, path, "embedding", QVEC, k=10,
        options=DatasetOptions(path=path, vector_ef=10, vector_refine_factor=50),
        tiebreak_cols=["vec_id"])
    assert [r.vec_id for r in via_opts.collect()] == [r.vec_id for r in base.collect()]
