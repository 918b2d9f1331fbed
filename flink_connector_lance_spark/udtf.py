"""``vector_search`` SQL table function (UDTF).

Parity with the reference's ``LanceVectorSearchFunction``
(ref table/LanceVectorSearchFunction.java:71-357):
``SELECT * FROM vector_search(path, column, ARRAY[...], k, metric)``.

Improvements over the reference (SURVEY.md §7.0.4):
- output schema is the *actual* dataset schema + ``_distance`` (derived in
  ``analyze()`` from the parquet footer), not a hard-coded 4-column row
  (ref :68-70, :344-356);
- the searcher cache is keyed on (path, column) exactly like the
  reference (ref :113-136);
- optional trailing ``nprobes`` / ``ef`` / ``refine_factor`` arguments —
  the search-time knobs of ref config/LanceOptions.java:215-237 that the
  reference threads into every native query
  (ref LanceVectorSearch.java:146-163) — prune the candidate set via LSH
  bucketing before exact scoring.

Scale posture: the per-search state is (a) a float64 matrix of ONLY the
vector column, decoded zero-copy from Arrow (never ``to_pylist``), and
(b) the Arrow table kept columnar; only the k winning rows are ever
materialized to Python objects (``table.take``). That bounds the Python
heap at matrix + Arrow buffers, not n * row-width Python objects. This is
still the single-process searcher the reference ships — parity by design
(ref opens one JNI searcher per (path, column)); for corpus-scale exact
search use the distributed ``operators.knn.knn``, which handles the same
query as a TakeOrdered plan over all executors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, StructType

from .operators.ann import make_planes

_CACHE: dict[tuple[str, str], tuple] = {}


def _vector_matrix(table, column: str) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column without a Python
    round-trip: flatten the Arrow list buffer and reshape."""
    arr = table.column(column).combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    if n == 0:
        return flat.reshape(0, 0)
    dim = len(flat) // n
    return flat.reshape(n, dim)


def _load(path: str, column: str):
    key = (path, column)
    if key not in _CACHE:
        table = pq.read_table(path)  # columnar; rows materialize only via take()
        mat = _vector_matrix(table, column)
        planes = make_planes(num_planes=8, dim=mat.shape[1] if mat.size else 0)
        sigs = _row_signatures(mat, planes)
        _CACHE[key] = (table, mat, planes, sigs)
    return _CACHE[key]


def _row_signatures(mat: np.ndarray, planes) -> np.ndarray:
    """8-bit LSH signature per row (same hyperplanes as operators.ann)."""
    if mat.size == 0:
        return np.zeros(0, dtype=np.int64)
    pm = np.asarray(planes, dtype=np.float64)  # (P, dim)
    bits = (mat @ pm.T) > 0  # (n, P)
    weights = (1 << np.arange(pm.shape[0])).astype(np.int64)
    return bits @ weights


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


def candidate_indices(path: str, column: str, query, nprobes: int | None = None,
                      ef: int | None = None) -> np.ndarray:
    """Row indices the search will score — the observable effect of the
    search-time knobs. ``nprobes`` caps probed LSH buckets (exact bucket
    first, then hamming-1 neighbors in plane order); ``ef`` bounds the
    candidate pool (HNSW's dynamic-list analog, floor at nothing here —
    callers pass max(ef, k)). No knobs -> every row."""
    table, mat, planes, sigs = _load(path, column)
    if nprobes is None and ef is None:
        return np.arange(mat.shape[0])
    q = np.asarray([float(v) for v in query], dtype=np.float64)
    from .operators.ann import probe_signatures

    probes = probe_signatures(q, planes, multiprobe=True, nprobes=nprobes)
    cand = np.flatnonzero(np.isin(sigs, probes))
    if ef is not None:
        cand = cand[:ef]
    return cand


class VectorSearchUDTF:
    """Yields the dataset rows nearest to the query vector + _distance."""

    @staticmethod
    def analyze(path, column, query, k, metric, nprobes=None, ef=None, refine_factor=None):
        from pyspark.sql.functions import AnalyzeResult
        from pyspark.sql.pandas.types import from_arrow_schema

        schema = from_arrow_schema(pq.read_schema(path.value))
        out = StructType(schema.fields).add("_distance", DoubleType())
        return AnalyzeResult(schema=out)

    def eval(self, path: str, column: str, query: list, k: int, metric: str,
             nprobes: int | None = None, ef: int | None = None,
             refine_factor: int | None = None) -> Iterator[tuple]:
        q = np.asarray([float(v) for v in query], dtype=np.float64)
        if q.size == 0 or not np.all(np.isfinite(q)):
            raise ValueError("query vector must be non-empty and finite")
        table, mat, planes, sigs = _load(path, column)
        k = int(k)
        eff_ef = None if ef is None else max(int(ef), k)
        cand = candidate_indices(path, column, q, nprobes, eff_ef)
        d = np.round(_distances(mat[cand], q, metric), 6)
        if refine_factor is not None and int(refine_factor) > 1:
            # coarse select k*rf on a 2-decimal distance, exact re-rank
            coarse = np.round(d, 2)
            keep = np.lexsort((cand, coarse))[: k * int(refine_factor)]
            cand, d = cand[keep], d[keep]
        order = np.lexsort((cand, d))[:k]
        top_idx = cand[order]
        top_d = d[order]
        rows = table.take(top_idx).to_pylist()  # k rows only
        for row, dist in zip(rows, top_d):
            yield tuple(row.values()) + (float(dist),)


def register_vector_search(spark: SparkSession, name: str = "vector_search") -> None:
    """Session-scope registration (the reference's catalog refuses to store
    functions — ref table/LanceCatalog.java:648-678)."""
    spark.udtf.register(name, udtf(VectorSearchUDTF))
