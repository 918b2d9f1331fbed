"""Round-13 optimization pins: each test guards one operator-internal
change from the optimization round so a later edit can't silently undo
its equivalence or its plan shape.

- hybrid_search(vec_leg=...) must fuse identically to the internal-knn
  form (the one-scan knn_l2_dot depends on it).
- pq_search's from_json LUT literals must CONSTANT-FOLD (a non-folding
  regression would re-parse an ~80KB JSON string per row).
- load_table's schema memo must key on file identity (a rewritten file
  must re-infer).
- the dedup self-join inputs are materialized once (localCheckpoint):
  the signature pipeline must not appear twice in the executed plan.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.queries.knn import QVEC, _RRF_KCONST, _RRF_LEG_K, _RRF_TERMS


def test_hybrid_search_vec_leg_matches_internal_knn(spark, sf_dir):
    from flink_connector_lance_spark.functions import vector as V
    from flink_connector_lance_spark.operators.retrieval import hybrid_search

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    q = " ".join(_RRF_TERMS)
    base = hybrid_search(d, "text", "doc_id", q, e, "embedding", "vec_id",
                         QVEC, k=10, leg_k=_RRF_LEG_K, rrf_k=_RRF_KCONST)
    leg = (e.select("vec_id",
                    F.round(V.distance("embedding", QVEC, "cosine"), 6)
                    .alias("_distance"))
           .orderBy(F.asc("_distance"), F.asc("vec_id")).limit(_RRF_LEG_K))
    via_leg = hybrid_search(d, "text", "doc_id", q, e, "embedding", "vec_id",
                            QVEC, k=10, leg_k=_RRF_LEG_K, rrf_k=_RRF_KCONST,
                            vec_leg=leg)
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, via_leg.collect()))


def test_pq_adc_lut_literals_constant_fold(spark, sf_dir, tmp_path):
    from flink_connector_lance_spark import pq as PQ
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = str(tmp_path / "pqfold")
    e = load_table(spark, sf_dir, "embeddings").limit(64)
    write_dataset(e, path, mode="overwrite")
    PQ.build_pq_index(spark, path, "embedding", id_col="vec_id",
                      num_sub_vectors=8, num_bits=4, iterations=1)
    out = PQ.pq_search(spark, path, "embedding", QVEC, k=5, refine_factor=2,
                       tiebreak_cols=["vec_id"], round_digits=6)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # the LUT json literals fold to plain array literals at optimization
    # time — nothing json-shaped may survive into the executed plan
    assert "from_json" not in opt.lower()
    assert len(out.collect()) == 5


def test_load_table_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    import shutil

    from flink_connector_lance_spark import io as IO

    sf = str(tmp_path / "sfx")
    os.makedirs(sf)
    spark.range(3).selectExpr("id AS a").write.parquet(f"{sf}/t.parquet")
    assert IO.load_table(spark, sf, "t").columns == ["a"]
    shutil.rmtree(f"{sf}/t.parquet")
    spark.range(3).selectExpr("id AS a", "id AS b").write.parquet(f"{sf}/t.parquet")
    # rewritten file (new mtime/size) must re-infer, not serve the memo
    assert IO.load_table(spark, sf, "t").columns == ["a", "b"]


def test_table_row_count_handles_file_and_directory_tables(spark, tmp_path):
    from flink_connector_lance_spark.io import table_row_count

    sf = str(tmp_path / "sfy")
    os.makedirs(sf)
    # directory table (Spark part files — the scale-stress corpus shape)
    spark.range(7).repartition(3).write.parquet(f"{sf}/d.parquet")
    assert table_row_count(sf, "d") == 7
    # single-file table (the driver corpus shape)
    assert table_row_count("/root/testdata/sf0.001", "embeddings") > 0


def test_minhash_self_join_reads_materialized_bands_once(spark, sf_dir):
    from flink_connector_lance_spark.operators.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    plan = minhash_lsh_pairs(d, "text", "doc_id", 16, 4) \
        ._jdf.queryExecution().executedPlan().toString()
    # both join sides scan the checkpointed band relation; the md5
    # signature pipeline (and the parquet scan under it) must not be
    # duplicated per side
    assert plan.count("Scan parquet") == 0
    assert "ExistingRDD" in plan
