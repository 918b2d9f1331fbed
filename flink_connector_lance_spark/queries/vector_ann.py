"""ANN scale-path queries: LSH-bucketed and IVF-coarse approximate search.

These are the distributed stand-ins for the reference's native Lance ANN
indexes (ref LanceIndexBuilder.java, vector.nprobes default 20 ->
nprobes=2 here against 10 cells — same probe ratio).
"""

from __future__ import annotations

from ..io import load_table
from ..operators import ann as A
from ..registry import register
from .knn import _L2, _QSQL, QVEC

_PLANES = A.make_planes(num_planes=4, dim=64)


def _planes_sql() -> str:
    return ", ".join(
        "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[] AS p" + str(p)
        for p, plane in enumerate(_PLANES)
    )


def _sig_sql() -> str:
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform(embedding::DOUBLE[], (x,i) -> x * p{p}[i])) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(len(_PLANES))
    )


@register(
    "ann_lsh",
    oracle=(
        lambda: f"""
    WITH qv AS (SELECT {_QSQL} AS q, {_planes_sql()})
    SELECT vec_id, _distance FROM (
        SELECT vec_id, {_L2} AS _distance, ({_sig_sql()}) AS sig
        FROM embeddings, qv)
    WHERE sig IN ({", ".join(str(s) for s in A.probe_signatures(QVEC, _PLANES))})
    ORDER BY _distance, vec_id
    LIMIT 10
    """
    )(),
    doc="ANN via random-hyperplane LSH: 4-bit signature (projection only, "
        "no shuffle), multi-probe hamming-1 buckets, exact top-k among "
        "candidates (operators.ann.lsh_knn).",
)
def ann_lsh(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return A.lsh_knn(e, "embedding", QVEC, k=10, metric="l2", planes=_PLANES,
                     multiprobe=True, tiebreak_cols=["vec_id"],
                     round_digits=6).select("vec_id", "_distance")


@register(
    "ann_ivf_coarse",
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q),
    cent AS (
        SELECT label, list(c ORDER BY i) AS centroid FROM (
            SELECT label, i.i AS i, avg(embedding[i.i]) AS c
            FROM embeddings, generate_series(1, 64) i(i)
            GROUP BY label, i.i)
        GROUP BY label),
    centd AS (
        SELECT label,
               round(sqrt(list_sum(list_transform(centroid::DOUBLE[],
                     (x,i) -> (x - q[i]) * (x - q[i])))), 6) AS cd
        FROM cent, qv),
    chosen AS (SELECT label FROM centd ORDER BY cd, label LIMIT 2)
    SELECT vec_id, _distance FROM (
        SELECT e.vec_id, {_L2} AS _distance
        FROM embeddings e JOIN chosen USING (label), qv)
    ORDER BY _distance, vec_id
    LIMIT 10
    """,
    doc="IVF-style coarse quantizer: per-cell centroids (posexplode + "
        "two-level partial agg), probe 2 nearest cells, exact L2 top-k "
        "inside probed cells (operators.ann.ivf_coarse_knn).",
)
def ann_ivf_coarse(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return A.ivf_coarse_knn(e, "embedding", "label", QVEC, k=10, nprobes=2,
                            tiebreak_cols=["vec_id"], round_digits=6).select("vec_id", "_distance")


@register(
    "ann_ivf_pq",
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q),
    exact AS (
        SELECT vec_id, _distance FROM (
            SELECT vec_id, {_L2} AS _distance FROM embeddings, qv)
        ORDER BY _distance, vec_id
        LIMIT 10)
    SELECT 'adc_refine' AS branch, vec_id, _distance FROM exact
    UNION ALL
    SELECT 'hnsw' AS branch, vec_id, _distance FROM exact
    """,
    doc="Emulated IVF_PQ + IVF_HNSW (the reference's indexed-search family "
        "— ref LanceIndexBuilder.java:117-179) as two tagged branches over "
        "one persisted dataset. 'adc_refine': per-sub-space k-means "
        "codebooks at the reference defaults (16 sub-vectors x 8 bits = 16 "
        "bytes/vector), ADC search in codegen over the skinny codes "
        "relation, top k*refine_factor, exact re-rank (ref vector.refine-"
        "factor, config/LanceOptions.java:232-237). 'hnsw': per-IVF-cell "
        "HNSW graphs (hnsw.py) traversed best-first with ef as the real "
        "dynamic-list bound, merged + exact-reranked. The oracle is the "
        "EXACT top-10 for both branches: the refine window (100) exceeds "
        "the measured worst ADC rank of any true top-10 neighbor (17 at "
        "both sf0.01 and sf0.1) by ~6x, and the HNSW traversal at ef=200 "
        "over 4 cells empirically recovers the exact set at both SFs "
        "(verified by the shared hash gate run at both scales) — the same "
        "oracle-exactness contract ann_lsh/ann_ivf_coarse declare via "
        "their probe widths.",
)
def ann_ivf_pq(spark, sf_dir):
    import os
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from .. import pq as PQ
    from ..hnsw import build_hnsw_index, has_hnsw_index, hnsw_search
    from ..index import build_index
    from ..options import DatasetOptions
    from ..sources.writer import write_dataset

    e = load_table(spark, sf_dir, "embeddings")
    sf = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), "fcls_datasets", f"pq-{sf}-{os.getpid()}")
    if not PQ.has_pq_index(path, "embedding"):
        # build once per (sf, process): the indexes are the artifact under
        # test; repeated calls (bench best-of-2) search the existing index
        shutil.rmtree(path, ignore_errors=True)
        write_dataset(e, path, mode="overwrite")
        PQ.build_pq_index(spark, path, "embedding", id_col="vec_id",
                          num_sub_vectors=16, num_bits=8, iterations=2)
    if not has_hnsw_index(path, "embedding"):
        res = build_index(path, "embedding", "ivf_flat", spark=spark,
                          id_col="vec_id",
                          options=DatasetOptions(path=path, index_num_partitions=4))
        assert res.success, res.error
        build_hnsw_index(spark, path, "embedding", id_col="vec_id",
                         m=16, ef_construction=100)
    adc = PQ.pq_search(spark, path, "embedding", QVEC, k=10, refine_factor=10,
                       tiebreak_cols=["vec_id"], round_digits=6) \
        .select(F.lit("adc_refine").alias("branch"), "vec_id", "_distance")
    hn = hnsw_search(spark, path, "embedding", QVEC, k=10, ef=200,
                     tiebreak_cols=["vec_id"], round_digits=6) \
        .select(F.lit("hnsw").alias("branch"), "vec_id", "_distance")
    return adc.unionByName(hn)
