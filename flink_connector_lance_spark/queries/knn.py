"""KNN vector-search queries (ref §2.7 — the reference's signature operator).

Determinism: distances are computed in DOUBLE on both sides, rounded to 6
decimals, and top-k selection orders by (rounded distance, vec_id) so set
membership cannot flip on engine-level float noise.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from ..io import load_table
from ..operators.knn import knn
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
    "knn_l2",
    oracle=_oracle(_L2),
    doc="Exact KNN, L2 metric, k=10 (ref LanceVectorSearch.java:121-210; "
        "TakeOrdered per-partition top-k, no global sort).",
)
def knn_l2(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return knn(e, "embedding", QVEC, k=10, metric="l2",
               tiebreak_cols=["vec_id"], round_digits=6).select("vec_id", "_distance")


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
    "knn_dot",
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q)
    SELECT vec_id, _distance, round(1.0 / (1.0 + _distance), 6) AS similarity
    FROM (
        SELECT vec_id, {_NEGDOT} AS _distance
        FROM embeddings, qv
    )
    ORDER BY _distance, vec_id
    LIMIT 10
    """,
    doc="Exact KNN, dot metric (negated dot product; smaller = closer) "
        "plus the similarity score 1/(1+d) of ref "
        "LanceVectorSearch.java:420-426 as a trailing column.",
)
def knn_dot(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = knn(e, "embedding", QVEC, k=10, metric="dot",
              tiebreak_cols=["vec_id"], round_digits=6, with_similarity=True)
    return out.select("vec_id", "_distance", F.round("similarity", 6).alias("similarity"))


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
