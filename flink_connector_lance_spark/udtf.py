"""``vector_search`` SQL table function (UDTF).

Parity with the reference's ``LanceVectorSearchFunction``
(ref table/LanceVectorSearchFunction.java:71-357):
``SELECT * FROM vector_search(path, column, ARRAY[...], k, metric)``.

Improvements over the reference (SURVEY.md §7.0.4):
- output schema is the *actual* dataset schema + ``_distance`` (derived in
  ``analyze()`` from the parquet footer), not a hard-coded 4-column row
  (ref :68-70, :344-356);
- the searcher cache is keyed on (path, column) exactly like the
  reference (ref :113-136).

Like the reference's table function, one ``eval`` invocation serves the
whole query — this is the SQL-ergonomics path for small/indexed lookups;
the distributed exact path is ``operators.knn.knn``.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, StructType

_CACHE: dict[tuple[str, str], tuple] = {}


def _load(path: str, column: str):
    key = (path, column)
    if key not in _CACHE:
        table = pq.read_table(path)
        mat = np.asarray(table.column(column).to_pylist(), dtype=np.float64)
        _CACHE[key] = (table, mat)
    return _CACHE[key]


def _distances(mat: np.ndarray, q: np.ndarray, metric: str) -> np.ndarray:
    m = metric.lower()
    if m == "l2":
        return np.sqrt(((mat - q) ** 2).sum(axis=1))
    if m == "cosine":
        qn = q / np.linalg.norm(q)
        mn = np.linalg.norm(mat, axis=1)
        return 1.0 - (mat @ qn) / mn
    if m == "dot":
        return -(mat @ q)
    raise ValueError(f"unknown metric {metric!r}")


class VectorSearchUDTF:
    """Yields the dataset rows nearest to the query vector + _distance."""

    @staticmethod
    def analyze(path, column, query, k, metric):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(pq.read_schema(path.value))
        out = StructType(schema.fields).add("_distance", DoubleType())
        return AnalyzeResult(schema=out)

    def eval(self, path: str, column: str, query: list, k: int, metric: str) -> Iterator[tuple]:
        q = np.asarray([float(v) for v in query], dtype=np.float64)
        if q.size == 0 or not np.all(np.isfinite(q)):
            raise ValueError("query vector must be non-empty and finite")
        table, mat = _load(path, column)
        d = np.round(_distances(mat, q, metric), 6)
        order = np.lexsort((np.arange(len(d)), d))[: int(k)]
        cols = [table.column(i).to_pylist() for i in range(table.num_columns)]
        for i in order:
            yield tuple(c[i] for c in cols) + (float(d[i]),)


def register_vector_search(spark: SparkSession, name: str = "vector_search") -> None:
    """Session-scope registration (the reference's catalog refuses to store
    functions — ref table/LanceCatalog.java:648-678)."""
    spark.udtf.register(name, udtf(VectorSearchUDTF))
