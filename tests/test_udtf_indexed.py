"""vector_search UDTF routing: PQ-indexed datasets search through the
on-disk index (codes + codebooks in the worker, candidate rows fetched by
a pushed id filter) instead of materializing the table; the searcher
cache is LRU-bounded."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from flink_connector_lance_spark import pq, udtf
from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.knn import knn
from flink_connector_lance_spark.queries.knn import QVEC
from flink_connector_lance_spark.sources.writer import write_dataset


@pytest.fixture(scope="module")
def indexed_ds(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("udtf") / "ds")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    pq.build_pq_index(spark, path, "embedding", id_col="vec_id",
                      num_sub_vectors=16, num_bits=8, iterations=2, replace=True)
    return path, e


def test_indexed_route_detected(indexed_ds, sf_dir):
    path, _ = indexed_ds
    assert udtf.uses_indexed_route(path, "embedding", "l2")
    # metric mismatch -> flat fallback; plain parquet -> flat
    assert not udtf.uses_indexed_route(path, "embedding", "cosine")
    assert not udtf.uses_indexed_route(f"{sf_dir}/embeddings.parquet", "embedding", "l2")


def test_indexed_eval_matches_exact_topk(indexed_ds):
    path, e = indexed_ds
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 10, "l2",
                                            refine_factor=20))
    want = knn(e, "embedding", QVEC, k=10, tiebreak_cols=["vec_id"],
               round_digits=6).collect()
    cols = e.columns
    vec_i = cols.index("vec_id")
    assert [r[vec_i] for r in got] == [r.vec_id for r in want]
    assert [round(r[-1], 6) for r in got] == [round(r._distance, 6) for r in want]
    # worker state is the PQ index, not the table: the cache entry for the
    # indexed key holds codes, and no flat entry was created for the path
    assert any(k[0] == path and k[2] == "pq" for k in udtf._CACHE)
    assert not any(k[0] == path and k[2] == "flat" for k in udtf._CACHE)


def test_indexed_eval_scores_unindexed_tail(indexed_ds, spark):
    path, e = indexed_ds
    # append a synthetic exact-match row AFTER the index build: it is in
    # no indexed file, so only the tail brute-force can find it
    new = spark.createDataFrame(
        [(999_999, [float(v) for v in QVEC], 0)],
        "vec_id long, embedding array<float>, label int")
    write_dataset(new.select(*e.columns), path, mode="append")
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 1, "l2"))
    vec_i = e.columns.index("vec_id")
    assert got[0][vec_i] == 999_999
    assert got[0][-1] == 0.0


def test_udtf_sql_end_to_end_on_indexed_dataset(indexed_ds, spark):
    path, e = indexed_ds
    udtf.register_vector_search(spark)
    qarr = "array(" + ", ".join(f"double({v})" for v in QVEC) + ")"
    rows = spark.sql(f"""
        SELECT vec_id, round(_distance, 6) AS d
        FROM vector_search('{path}', 'embedding', {qarr}, 5, 'l2', NULL, NULL, 20)
    """).collect()
    # expected = exact k-NN over the dataset AS IT IS ON DISK (this test
    # must not depend on whether the tail-append test ran before it)
    from flink_connector_lance_spark.sources.reader import read_dataset

    want = knn(read_dataset(spark, path), "embedding", QVEC, k=5,
               tiebreak_cols=["vec_id"], round_digits=6).collect()
    assert [r.vec_id for r in rows] == [r.vec_id for r in want]


def test_searcher_cache_is_lru_bounded(tmp_path):
    udtf._CACHE.clear()
    for i in range(udtf._CACHE_MAX + 3):
        p = str(tmp_path / f"t{i}.parquet")
        papq.write_table(pa.table({
            "id": pa.array([0, 1], pa.int64()),
            "v": pa.array([[0.0, 1.0], [1.0, 0.0]], pa.list_(pa.float64())),
        }), p)
        udtf._load_flat(p, "v")
    assert len(udtf._CACHE) == udtf._CACHE_MAX
    # most-recently-used entries survive
    last = str(tmp_path / f"t{udtf._CACHE_MAX + 2}.parquet")
    # key carries the staleness token as its 4th element
    assert any(k[0] == last and k[2] == "flat" for k in udtf._CACHE)
    hit = udtf._load_flat(last, "v")
    assert isinstance(hit[1], np.ndarray)
    assert os.path.exists(last)


def test_string_id_pq_dataset_routes_flat(spark, sf_dir, tmp_path):
    """A PQ index built over a string-id corpus: the distributed search
    handles it (DataFrame joins are dtype-agnostic), but the in-process
    searcher keys candidates through int64 arrays — the SQL route must
    fall back to the flat exact scan, not crash on the coercion."""
    import pyspark.sql.functions as F

    from flink_connector_lance_spark import pq as PQ

    path = str(tmp_path / "stride")
    e = load_table(spark, sf_dir, "embeddings").select(
        F.concat(F.lit("v-"), F.col("vec_id").cast("string")).alias("vid"),
        "embedding")
    write_dataset(e, path, mode="overwrite")
    PQ.build_pq_index(spark, path, "embedding", id_col="vid",
                      num_sub_vectors=8, num_bits=4, iterations=1)
    q = [0.1] * 64
    # the distributed index search works with string ids end-to-end
    dist = PQ.pq_search(spark, path, "embedding", q, k=3, refine_factor=4,
                        tiebreak_cols=["vid"], round_digits=6) \
        .select("vid", "_distance").collect()
    assert len(dist) == 3 and all(isinstance(r.vid, str) for r in dist)
    # the SQL route refuses the int64-keyed index and goes flat (exact)
    assert not udtf.uses_indexed_route(path, "embedding", "l2")
    udtf._CACHE.clear()
    udtf.register_vector_search(spark)
    qarr = "array(" + ", ".join(f"double({v})" for v in q) + ")"
    got = spark.sql(
        f"SELECT vid, _distance FROM vector_search('{path}', 'embedding', {qarr}, 3, 'l2')"
    ).collect()
    from flink_connector_lance_spark.operators.knn import knn

    want = knn(e, "embedding", q, k=3, metric="l2",
               tiebreak_cols=["vid"], round_digits=6) \
        .select("vid", "_distance").collect()
    assert [(r.vid, r._distance) for r in got] == [tuple(r) for r in want]


def test_udtf_reads_directory_style_parquet(spark, sf_dir, tmp_path):
    """A Spark-written parquet TABLE is a directory of part files — both
    search UDTFs must treat it like the single-file case (flat scan over
    all parts), not crash trying to open the directory as one file."""
    path = str(tmp_path / "dirparq")
    e = load_table(spark, sf_dir, "embeddings")
    e.repartition(3).write.mode("overwrite").parquet(path)
    udtf._CACHE.clear()
    udtf.register_vector_search(spark)
    qarr = "array(" + ", ".join(f"double({v})" for v in QVEC) + ")"
    got = spark.sql(
        f"SELECT vec_id, _distance FROM vector_search('{path}', 'embedding', {qarr}, 5, 'l2')"
    ).collect()
    from flink_connector_lance_spark.operators.knn import knn

    want = knn(e, "embedding", QVEC, k=5, metric="l2",
               tiebreak_cols=["vec_id"], round_digits=6) \
        .select("vec_id", "_distance").collect()
    assert [(r.vec_id, r._distance) for r in got] == [tuple(r) for r in want]


def test_udtf_sees_evolved_columns(spark, sf_dir, tmp_path):
    """analyze() must declare the MANIFEST schema, not files[0]'s footer:
    after an evolving append adds a column, the oldest fragment's footer
    misses it — both the declared schema and the fetched rows must carry
    the new column (old rows null-fill)."""
    from flink_connector_lance_spark.options import DatasetOptions

    path = str(tmp_path / "evolved")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    new = spark.createDataFrame(
        [(777_777, [float(v) for v in QVEC], 0, "fresh")],
        "vec_id long, embedding array<float>, label int, tag string")
    write_dataset(new.select(*e.columns, "tag"), path, mode="append",
                  options=DatasetOptions(path=path, schema_evolution=True))
    udtf._CACHE.clear()
    udtf.register_vector_search(spark)
    qarr = "array(" + ", ".join(f"double({v})" for v in QVEC) + ")"
    df = spark.sql(
        f"SELECT * FROM vector_search('{path}', 'embedding', {qarr}, 3, 'l2')")
    assert "tag" in df.columns, "analyze() missed the evolved column"
    rows = df.collect()
    by_id = {r.vec_id: r for r in rows}
    assert by_id[777_777].tag == "fresh"  # the exact-match row wins at d=0
    assert all(r.tag is None for r in rows if r.vec_id != 777_777)


@pytest.fixture(scope="module")
def hnsw_only_ds(spark, sf_dir, tmp_path_factory):
    """Dataset with an HNSW graph (over IVF cells) but NO PQ codes."""
    from flink_connector_lance_spark.hnsw import build_hnsw_index
    from flink_connector_lance_spark.index import build_index
    from flink_connector_lance_spark.options import DatasetOptions

    path = str(tmp_path_factory.mktemp("udtf_hnsw") / "ds")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    res = build_index(path, "embedding", "ivf_flat", spark=spark, id_col="vec_id",
                      options=DatasetOptions(path=path, index_num_partitions=4))
    assert res.success, res.error
    build_hnsw_index(spark, path, "embedding", id_col="vec_id", m=16,
                     ef_construction=64)
    return path, e


def test_hnsw_route_detected_only_without_pq(indexed_ds, hnsw_only_ds):
    pq_path, _ = indexed_ds
    h_path, _ = hnsw_only_ds
    assert udtf.uses_hnsw_route(h_path, "embedding", "l2")
    assert not udtf.uses_hnsw_route(h_path, "embedding", "cosine")
    # PQ codes win the in-worker memory call: hnsw route must NOT fire
    # when the indexed (PQ) route already does
    assert not udtf.uses_hnsw_route(pq_path, "embedding", "l2")
    assert udtf.uses_indexed_route(pq_path, "embedding", "l2")


def test_hnsw_eval_matches_exact_topk(hnsw_only_ds):
    path, e = hnsw_only_ds
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 10, "l2",
                                            ef=400))
    want = knn(e, "embedding", QVEC, k=10, tiebreak_cols=["vec_id"],
               round_digits=6).collect()
    vec_i = e.columns.index("vec_id")
    assert [r[vec_i] for r in got] == [r.vec_id for r in want]
    assert [round(r[-1], 6) for r in got] == [round(r._distance, 6) for r in want]
    # worker state is the graph (meta + per-cell slabs), never a flat table
    assert any(k[0] == path and k[2] == "hnsw-meta" for k in udtf._CACHE)
    assert any(k[0] == path and k[2] == "hnsw-cell" for k in udtf._CELL_CACHE)
    assert not any(k[0] == path and k[2] == "flat" for k in udtf._CACHE)


def test_hnsw_eval_loads_only_probed_cells(hnsw_only_ds, monkeypatch):
    """The round-4 flaw: _load_hnsw read EVERY cell's graph + raw vector
    slabs into the worker. Now the files are read per probed-cell
    partition directory — spy on pq.read_table and assert no un-probed
    cell's directory is ever opened."""
    path, e = hnsw_only_ds
    udtf._CELL_CACHE.clear()
    opened: list[str] = []
    real = udtf.pq.read_table

    def spy(source, *a, **kw):
        opened.append(str(source))
        return real(source, *a, **kw)

    monkeypatch.setattr(udtf.pq, "read_table", spy)
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 5, "l2",
                                            nprobes=1, ef=50))
    assert len(got) == 5
    cell_reads = [p for p in opened if "cell=" in p]
    assert cell_reads, "expected per-cell partition reads"
    probed = {p.split("cell=")[1].split("/")[0] for p in cell_reads}
    assert len(probed) == 1, f"nprobes=1 must touch ONE cell, got {probed}"
    # the index has 4 cells; the full vectors table was never opened
    assert not any(p.rstrip("/").endswith("vectors.parquet") for p in opened)
    # second eval with the same probe hits the per-cell LRU: zero new reads
    opened.clear()
    list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 5, "l2",
                                      nprobes=1, ef=50))
    assert not [p for p in opened if "cell=" in p]


def test_hnsw_eval_nprobes_and_tail(hnsw_only_ds, spark):
    path, e = hnsw_only_ds
    # nprobes prunes the probed cells but still returns k ordered rows
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 5, "l2",
                                            nprobes=2, ef=50))
    assert len(got) == 5
    ds = [r[-1] for r in got]
    assert ds == sorted(ds)
    # a row appended after the build (unindexed tail) can win
    new = spark.createDataFrame(
        [(888_888, [float(v) for v in QVEC], 0)],
        "vec_id long, embedding array<float>, label int")
    write_dataset(new.select(*e.columns), path, mode="append")
    got = list(udtf.VectorSearchUDTF().eval(path, "embedding", QVEC, 1, "l2"))
    vec_i = e.columns.index("vec_id")
    assert got[0][vec_i] == 888_888 and got[0][-1] == 0.0


def test_flat_scan_cache_sees_appends(spark, tmp_path):
    """The flat-route UDTF search must see rows appended AFTER a cached
    search of the same dataset (the cache key carries the manifest
    version; PQ/IVF/HNSW caches already key on their index mtime)."""
    import pyarrow as pa

    from flink_connector_lance_spark.sources import lance_format as LF
    from flink_connector_lance_spark.udtf import register_vector_search

    root = str(tmp_path / "grow")
    LF.write_native_dataset(root, pa.table({
        "id": pa.array([1], pa.int64()),
        "emb": pa.array([[1.0, 0.0]], pa.list_(pa.float32())),
    }), mode="create")
    register_vector_search(spark)
    q = "SELECT v.id FROM vector_search('%s', 'emb', ARRAY(0.0D, 1.0D), 2, 'L2') AS v" % root
    assert [r.id for r in spark.sql(q).collect()] == [1]
    # append the exact query vector: the next search must return it first
    LF.write_native_dataset(root, pa.table({
        "id": pa.array([2], pa.int64()),
        "emb": pa.array([[0.0, 1.0]], pa.list_(pa.float32())),
    }), mode="append")
    assert [r.id for r in spark.sql(q).collect()] == [2, 1]
