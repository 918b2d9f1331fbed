"""KNN vector-search queries (ref §2.7 — the reference's signature operator).

Determinism: distances are computed in DOUBLE on both sides, rounded to 6
decimals, and top-k selection orders by (rounded distance, vec_id) so set
membership cannot flip on engine-level float noise.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ..io import load_table
from ..operators.knn import knn, knn_join
from ..registry import register

# Deterministic 64-dim query vector (embedding dim of the corpus).
QVEC = [round(math.sin(i + 1) * 0.5, 6) for i in range(64)]
_QSQL = "[" + ", ".join(repr(v) for v in QVEC) + "]::DOUBLE[]"

_L2 = "round(sqrt(list_sum(list_transform(embedding::DOUBLE[], (x,i) -> (x - q[i]) * (x - q[i])))), 6)"
_DOT = "list_sum(list_transform(embedding::DOUBLE[], (x,i) -> x * q[i]))"
_NORM = "sqrt(list_sum(list_transform(embedding::DOUBLE[], (x,i) -> x * x)))"
_QNORM = "sqrt(list_sum(list_transform(q, (x,i) -> x * x)))"
_COS = f"round(1.0 - ({_DOT}) / (({_NORM}) * ({_QNORM})), 6)"
_NEGDOT = f"round(-({_DOT}), 6)"


def _oracle(dist_expr: str, where: str = "", k: int = 10, extra_cols: str = "") -> str:
    return f"""
    WITH qv AS (SELECT {_QSQL} AS q)
    SELECT vec_id, _distance{extra_cols}
    FROM (
        SELECT vec_id, label, {dist_expr} AS _distance
        FROM embeddings, qv
        {where}
    )
    ORDER BY _distance, vec_id
    LIMIT {k}
    """


@register(
    "knn_l2_dot",
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q),
    l2_top AS (
        SELECT vec_id, _distance
        FROM (SELECT vec_id, {_L2} AS _distance FROM embeddings, qv)
        ORDER BY _distance, vec_id LIMIT 10
    ),
    dot_top AS (
        SELECT vec_id, _distance
        FROM (SELECT vec_id, {_NEGDOT} AS _distance FROM embeddings, qv)
        ORDER BY _distance, vec_id LIMIT 10
    )
    SELECT 'l2' AS metric, vec_id, _distance,
           round(1.0 / (1.0 + _distance), 6) AS similarity
    FROM l2_top
    UNION ALL
    SELECT 'dot' AS metric, vec_id, _distance,
           round(1.0 / (1.0 + _distance), 6) AS similarity
    FROM dot_top
    """,
    doc="Exact KNN, L2 + dot metrics in one tagged result, k=10 each "
        "(ref LanceVectorSearch.java:121-210; config/LanceOptions.java:323-346). "
        "Dot is the negated dot product (smaller = closer); similarity is the "
        "1/(1+d) score of ref LanceVectorSearch.java:420-426. Each branch "
        "compiles to TakeOrdered (per-partition top-k, no global sort).",
)
def knn_l2_dot(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = []
    for metric in ("l2", "dot"):
        top = knn(e, "embedding", QVEC, k=10, metric=metric,
                  tiebreak_cols=["vec_id"], round_digits=6, with_similarity=True)
        out.append(top.select(
            F.lit(metric).alias("metric"), "vec_id", "_distance",
            F.round("similarity", 6).alias("similarity")))
    return out[0].unionAll(out[1])


@register(
    "knn_cosine",
    oracle=_oracle(_COS),
    doc="Exact KNN, cosine metric (ref config/LanceOptions.java:323-346).",
)
def knn_cosine(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return knn(e, "embedding", QVEC, k=10, metric="cosine",
               tiebreak_cols=["vec_id"], round_digits=6).select("vec_id", "_distance")


@register(
    "knn_join_batch",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    c AS (
        SELECT vec_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id >= 5
    ),
    d AS (
        SELECT q.query_id, c.vec_id,
               round(sqrt(list_sum(list_transform(c.cv,
                   (x, i) -> (x - q.qv[i]) * (x - q.qv[i])))), 6) AS _distance
        FROM q, c
    ),
    r AS (
        SELECT query_id, vec_id, _distance,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY _distance, vec_id) AS rn
        FROM d
    )
    SELECT query_id, vec_id, _distance FROM r WHERE rn <= 3
    """,
    doc="Batch similarity search (k-NN join): top-3 corpus neighbors for "
        "each of 5 query vectors in ONE distributed plan — queries "
        "broadcast, distances map-side, two-stage salted top-k "
        "(operators.knn.knn_join). The many-query path a retrieval-eval "
        "or hard-negative-mining pipeline uses at scale.",
)
def knn_join_batch(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 5)
    return knn_join(corpus, queries, "embedding", k=3, metric="l2").select(
        "query_id", "vec_id", "_distance"
    )


@register(
    "knn_l2_filtered",
    oracle=_oracle(_L2, where="WHERE label IN (1, 3, 5)", extra_cols=", label"),
    doc="Filtered KNN — predicate applied before the search "
        "(filtered ANN, ref LanceVectorSearch.java:166-201).",
)
def knn_l2_filtered(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return knn(e, "embedding", QVEC, k=10, metric="l2",
               filter=F.col("label").isin(1, 3, 5),
               tiebreak_cols=["vec_id"], round_digits=6).select("vec_id", "_distance", "label")


@register(
    "vector_search_udtf",
    oracle=_oracle(_L2),
    doc="SQL table-function path: SELECT ... FROM vector_search(path, col, "
        "ARRAY[...], k, metric) (ref table/LanceVectorSearchFunction.java:71-357; "
        "output schema = dataset schema + _distance, derived via analyze()).",
)
def vector_search_udtf(spark, sf_dir):
    from ..udtf import register_vector_search

    register_vector_search(spark)
    path = f"{sf_dir}/embeddings.parquet"
    qarr = "array(" + ", ".join(f"double({v})" for v in QVEC) + ")"
    return spark.sql(f"""
        SELECT vec_id, round(_distance, 6) AS _distance
        FROM vector_search('{path}', 'embedding', {qarr}, 10, 'l2')
    """)
