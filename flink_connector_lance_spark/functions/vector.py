"""Vector distance column expressions — JVM-side, no Python UDFs.

Re-expresses the reference's KNN distance surface
(ref LanceVectorSearch.java:274-285, config/LanceOptions.java:323-346:
metrics L2 / Cosine / Dot) as Catalyst expressions over
``array<float>`` columns. Everything here stays inside whole-stage
codegen: ``zip_with`` + ``aggregate`` fold in DOUBLE precision.

Distance conventions (smaller = closer, matching Lance):
- l2:      sqrt(sum((a_i - b_i)^2))
- cosine:  1 - dot(a,b) / (||a|| * ||b||)
- dot:     -dot(a,b)   (negated so smaller = more similar)

Similarity score = 1 / (1 + distance), 1.0 at distance 0
(ref LanceVectorSearch.java:420-426).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

METRICS = ("l2", "cosine", "dot")


def validate_query_vector(q: Sequence[float]) -> list[float]:
    """Reject empty / NaN / Inf query vectors (ref LanceVectorSearch.java:258-269)."""
    if q is None or len(q) == 0:
        raise ValueError("query vector must be non-empty")
    out = [float(v) for v in q]
    for v in out:
        if math.isnan(v) or math.isinf(v):
            raise ValueError(f"query vector contains NaN/Inf: {v}")
    return out


def vec_literal(q: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in q])


def _as_double(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_product(col, q: Sequence[float] | Column) -> Column:
    qc = vec_literal(q) if not isinstance(q, Column) else q
    prods = F.zip_with(_as_double(col), qc, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(col) -> Column:
    sq = F.aggregate(
        F.zip_with(_as_double(col), _as_double(col), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.sqrt(sq)


def l2_distance(col, q: Sequence[float] | Column) -> Column:
    qc = vec_literal(q) if not isinstance(q, Column) else q
    diff2 = F.zip_with(_as_double(col), qc, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v))


def cosine_distance(col, q: Sequence[float] | Column) -> Column:
    qc = vec_literal(q) if not isinstance(q, Column) else q
    return F.lit(1.0) - dot_product(col, qc) / (norm(col) * norm(qc))


def dot_distance(col, q: Sequence[float] | Column) -> Column:
    return -dot_product(col, q)


def distance(col, q: Sequence[float] | Column, metric: str = "l2") -> Column:
    m = metric.lower()
    if m == "l2":
        return l2_distance(col, q)
    if m == "cosine":
        return cosine_distance(col, q)
    if m == "dot":
        return dot_distance(col, q)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def similarity(distance_col: Column) -> Column:
    """1/(1+d) similarity score (ref LanceVectorSearch.java:420-426)."""
    return F.lit(1.0) / (F.lit(1.0) + distance_col)
