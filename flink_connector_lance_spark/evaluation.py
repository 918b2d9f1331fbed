"""ANN quality evaluation: recall@k of indexed search vs the exact scan.

An ANN index that silently returns the wrong neighbors is worse than a
slow exact scan — the reference leans on Lance's published recall
characteristics (ref README.md:164-173 index-selection table); the
emulated IVF/PQ/HNSW paths need the measurement made explicit. This
module runs the SAME query through the indexed route and the
brute-force route (``search_dataset(use_index=False)`` — the ground
truth by construction) and reports per-query and mean recall@k.

Evaluation cost note: each query collects k row *ids* (metadata-sized);
the searches themselves are the engine's distributed plans. Use a
sampled query set (tens of vectors) — recall estimates converge fast,
and this is an offline quality gate, not a hot path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def recall_at_k(approx_ids, exact_ids) -> float:
    """|approx ∩ exact| / |exact| (both are top-k id collections;
    ties broken identically upstream via deterministic tiebreaks)."""
    exact = list(exact_ids)
    if not exact:
        return 1.0
    return len(set(approx_ids) & set(exact)) / len(exact)


def evaluate_index_recall(
    spark: SparkSession,
    path: str,
    column: str,
    queries,
    k: int = 10,
    id_col: str = "id",
    metric: str = "l2",
    nprobes: "int | None" = None,
    ef: "int | None" = None,
    options=None,
) -> dict:
    """Recall@k of the dataset's built index against the exact scan.

    ``queries`` is a sequence of query vectors (list[float] each). Both
    routes use ``tiebreak_cols=(id_col,)`` and rounded distances so that
    equal-distance rows rank identically — recall differences measure
    the index's candidate selection, not tie ordering.

    Returns ``{"k", "num_queries", "mean_recall", "min_recall",
    "per_query": [float, ...]}``.
    """
    from .index import search_dataset

    per_query: list[float] = []
    for q in queries:
        exact = search_dataset(
            spark, path, column, q, k=k, metric=metric, use_index=False,
            tiebreak_cols=(id_col,), round_digits=6, options=options,
        ).select(id_col).collect()
        approx = search_dataset(
            spark, path, column, q, k=k, metric=metric, use_index=True,
            nprobes=nprobes, ef=ef, tiebreak_cols=(id_col,), round_digits=6,
            options=options,
        ).select(id_col).collect()
        per_query.append(
            recall_at_k([r[0] for r in approx], [r[0] for r in exact])
        )
    if not per_query:
        raise ValueError("need at least one query vector")
    return {
        "k": k,
        "num_queries": len(per_query),
        "mean_recall": sum(per_query) / len(per_query),
        "min_recall": min(per_query),
        "per_query": per_query,
    }
