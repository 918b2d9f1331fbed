"""Search-time knobs (vector.nprobes / vector.ef / vector.refine-factor —
ref config/LanceOptions.java:215-237) must observably change the candidate
set, in both the DataFrame ANN operators and the vector_search UDTF."""

from __future__ import annotations

import math

import pytest

from flink_connector_lance_spark.operators import ann as A
from flink_connector_lance_spark.options import DatasetOptions

QUERY = [round(math.sin(i + 1) * 0.5, 6) for i in range(64)]


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    from flink_connector_lance_spark.io import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_probe_signatures_nprobes_caps_buckets():
    planes = A.make_planes(num_planes=8, dim=64)
    full = A.probe_signatures(QUERY, planes, multiprobe=True)
    assert len(full) == 9  # exact + 8 hamming-1 neighbors
    one = A.probe_signatures(QUERY, planes, multiprobe=True, nprobes=1)
    assert one == full[:1]  # exact bucket always probed first
    assert A.probe_signatures(QUERY, planes, nprobes=4) == full[:4]
    with pytest.raises(ValueError):
        A.probe_signatures(QUERY, planes, nprobes=0)


def test_lsh_nprobes_changes_candidate_count(embeddings):
    planes = A.make_planes(num_planes=8, dim=64)
    narrow = A.lsh_candidates(embeddings, "embedding", QUERY, planes, nprobes=1).count()
    wide = A.lsh_candidates(embeddings, "embedding", QUERY, planes, nprobes=9).count()
    assert 0 < narrow < wide
    assert wide < embeddings.count()  # still pruned vs full scan


def test_lsh_knn_resolves_nprobes_from_options(embeddings):
    planes = A.make_planes(num_planes=8, dim=64)
    opts = DatasetOptions(path="/x", vector_nprobes=1)
    via_opts = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                         tiebreak_cols=["vec_id"], round_digits=6, options=opts)
    explicit = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                         nprobes=1, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in via_opts.collect()] == [r.vec_id for r in explicit.collect()]


def test_lsh_refine_factor_still_exact_topk(embeddings):
    # refine over-fetches then re-ranks exactly: top-k must equal the
    # unrefined answer whenever the coarse stage keeps >= the true top-k
    planes = A.make_planes(num_planes=8, dim=64)
    plain = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                      tiebreak_cols=["vec_id"], round_digits=6)
    refined = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                        refine_factor=20, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in plain.collect()] == [r.vec_id for r in refined.collect()]


def test_ivf_nprobes_from_options(embeddings):
    opts = DatasetOptions(path="/x", vector_nprobes=1)
    one = A.ivf_coarse_knn(embeddings, "embedding", "label", QUERY, k=5,
                           nprobes=None, options=opts,
                           tiebreak_cols=["vec_id"], round_digits=6)
    assert one.count() == 5
    with pytest.raises(ValueError):
        A.ivf_coarse_knn(embeddings, "embedding", "label", QUERY, k=5, nprobes=0)


def test_udtf_knobs_prune_candidates(sf_dir):
    from flink_connector_lance_spark.udtf import candidate_indices

    path = f"{sf_dir}/embeddings.parquet"
    full = candidate_indices(path, "embedding", QUERY)
    narrow = candidate_indices(path, "embedding", QUERY, nprobes=1)
    wide = candidate_indices(path, "embedding", QUERY, nprobes=9)
    assert 0 < len(narrow) < len(wide) < len(full)
    capped = candidate_indices(path, "embedding", QUERY, nprobes=9, ef=5)
    assert len(capped) == 5


def test_udtf_sql_accepts_knobs(spark, sf_dir):
    from flink_connector_lance_spark.udtf import register_vector_search

    register_vector_search(spark)
    path = f"{sf_dir}/embeddings.parquet"
    qarr = "array(" + ", ".join(f"double({v})" for v in QUERY) + ")"
    base = spark.sql(
        f"SELECT vec_id FROM vector_search('{path}', 'embedding', {qarr}, 5, 'l2')"
    ).collect()
    knobbed = spark.sql(
        f"SELECT vec_id FROM vector_search('{path}', 'embedding', {qarr}, 5, 'l2', 9, 10000, 4)"
    ).collect()
    assert len(base) == 5 and len(knobbed) == 5


def test_lsh_ef_bounds_candidate_pool(embeddings):
    planes = A.make_planes(num_planes=8, dim=64)
    full = A.lsh_candidate_pool(embeddings, "embedding", QUERY, planes).count()
    capped = A.lsh_candidate_pool(embeddings, "embedding", QUERY, planes,
                                  ef=7, tiebreak_cols=["vec_id"]).count()
    assert capped == 7 < full
    with pytest.raises(ValueError):
        A.lsh_candidate_pool(embeddings, "embedding", QUERY, planes, ef=0)
    # ef wider than the pool: results identical to the uncapped search
    plain = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                      tiebreak_cols=["vec_id"], round_digits=6)
    wide = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                     ef=100_000, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in wide.collect()] == [r.vec_id for r in plain.collect()]


def test_lsh_ef_resolves_from_options(embeddings):
    planes = A.make_planes(num_planes=8, dim=64)
    opts = DatasetOptions(path="/x", vector_ef=6)
    via_opts = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                         tiebreak_cols=["vec_id"], round_digits=6, options=opts)
    explicit = A.lsh_knn(embeddings, "embedding", QUERY, k=5, planes=planes,
                         ef=6, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in via_opts.collect()] == [r.vec_id for r in explicit.collect()]


def test_ivf_index_ef_bounds_candidate_pool(spark, sf_dir, tmp_path):
    """ef on the emulated-IVF route: with ef >= probed rows results equal
    the uncapped search; ef=k narrows the pool to the coarse top-k."""
    from flink_connector_lance_spark.index import build_index, ivf_index_knn
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = str(tmp_path / "ds")
    e = load_table(spark, sf_dir, "embeddings")
    write_dataset(e, path, mode="overwrite")
    res = build_index(path, "embedding", index_type="ivf_flat", spark=spark,
                      id_col="vec_id", replace=True)
    assert res.success, res.error

    plain = ivf_index_knn(spark, path, "embedding", QUERY, k=5, nprobes=2,
                          tiebreak_cols=["vec_id"], round_digits=6)
    wide = ivf_index_knn(spark, path, "embedding", QUERY, k=5, nprobes=2,
                         ef=100_000, tiebreak_cols=["vec_id"], round_digits=6)
    assert [r.vec_id for r in wide.collect()] == [r.vec_id for r in plain.collect()]
    # ef=k: pool narrows to the coarse top-k of the probed rows — row
    # count matches the uncapped search (both bounded by the probed pool)
    narrow = ivf_index_knn(spark, path, "embedding", QUERY, k=5, nprobes=2,
                           ef=5, tiebreak_cols=["vec_id"], round_digits=6)
    assert narrow.count() == min(5, plain.count())
    with pytest.raises(ValueError):
        ivf_index_knn(spark, path, "embedding", QUERY, k=5, nprobes=2, ef=0)
