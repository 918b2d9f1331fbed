"""KNN vector search operator (ref LanceVectorSearch.java:121-210).

``knn`` is the programmatic API the reference exposes as
``LanceVectorSearch.search(q, k[, filter])``: top-k rows by distance with a
trailing ``_distance`` column (ref :219-237), optional pre-filter
(filtered ANN, ref :166-201), optional ``similarity`` column
(ref :420-426).

Execution model (scale-first, contra the reference's single-node scan):
``orderBy(dist).limit(k)`` compiles to Spark's ``TakeOrderedAndProject``
— each partition computes a local top-k heap, the driver merges P*k
candidates. No global sort, no full shuffle; at 100 TB with 1000
executors the merge handles only 1000*k rows. When a native Lance ANN
index is available (sources.lance_backend), the indexed path is
preferred; this brute-force path is the always-correct fallback and the
exact-search baseline.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions import vector as V


def knn(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    k: int = 10,
    metric: str = "l2",
    filter: Column | str | None = None,
    distance_col: str = "_distance",
    with_similarity: bool = False,
    tiebreak_cols: Sequence[str] = (),
    round_digits: int | None = None,
) -> DataFrame:
    """Exact top-k nearest rows to ``query`` by ``metric``.

    Mirrors the reference surface: ``search(q, k, filter)`` returning the
    full row plus ``_distance`` (ref LanceVectorSearch.java:121-210).
    ``tiebreak_cols`` makes result sets deterministic under distance ties.
    ``round_digits`` rounds the emitted distance (ordering uses the
    rounded value first so engine-level float noise cannot flip set
    membership across platforms).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    q = V.validate_query_vector(query)
    if filter is not None:
        df = df.filter(filter)
    dist = V.distance(vector_col, q, metric)
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    out = df.withColumn(distance_col, dist)
    order = [F.asc(distance_col), *[F.asc(c) for c in tiebreak_cols]]
    out = out.orderBy(*order).limit(k)
    if with_similarity:
        out = out.withColumn("similarity", V.similarity(F.col(distance_col)))
    return out


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    vector_col: str,
    k: int,
    metric: str = "l2",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vector_col: str | None = None,
    distance_col: str = "_distance",
    round_digits: int | None = 6,
    salt_partitions: int = 16,
) -> DataFrame:
    """Batch similarity search: top-``k`` corpus neighbors for EVERY query
    row — the many-query generalization of ``knn`` (a training-data
    pipeline primitive: retrieval eval sets, hard-negative mining,
    embedding-space joins).

    Scale shape: the (small) query set broadcasts; distances are computed
    map-side on the corpus partitions (JVM ``zip_with``/``aggregate`` — the
    query vector is data here, not a literal, so unrolled chains don't
    apply); only a skinny (query_id, corpus_id, distance) row survives to
    the shuffle. Top-k is two-stage — stage 1 ranks within
    (query, salt-of-corpus-id) buckets so no single reducer sees more than
    ~n/salt_partitions candidates of one query, stage 2 ranks the
    ≤ salt_partitions*k survivors per query. Ordering ties break on
    corpus id, so results are deterministic.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    qv = query_vector_col or vector_col
    q = queries.select(
        F.col(query_id),
        F.col(qv).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vector_col).cast("array<double>").alias("__cv"),
    )
    dist = V.distance(F.col("__cv"), F.col("__qv"), metric)
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    skinny = (
        c.crossJoin(F.broadcast(q))
        .select(F.col(query_id), F.col(corpus_id), dist.alias(distance_col))
    )
    return _topk_per_query(skinny, query_id, corpus_id, distance_col, k, salt_partitions)


def _topk_per_query(skinny: DataFrame, query_id: str, corpus_id: str,
                    distance_col: str, k: int, salt_partitions: int) -> DataFrame:
    """Two-stage salted top-k over a skinny (query, corpus, distance)
    relation: stage 1 ranks within (query, salt-of-corpus-id) so no
    single reducer sees more than ~n/salt candidates of one query,
    stage 2 ranks the <= salt*k survivors. Ties break on corpus id."""
    w1 = Window.partitionBy(
        F.col(query_id), F.pmod(F.xxhash64(F.col(corpus_id)), F.lit(salt_partitions))
    ).orderBy(F.asc(distance_col), F.asc(corpus_id))
    w2 = Window.partitionBy(F.col(query_id)).orderBy(F.asc(distance_col), F.asc(corpus_id))
    return (
        skinny.withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def knn_join_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    vector_col: str,
    k: int,
    planes,
    metric: str = "l2",
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    query_vector_col: str | None = None,
    distance_col: str = "_distance",
    round_digits: int | None = 6,
    salt_partitions: int = 16,
) -> DataFrame:
    """Corpus-vs-corpus k-NN join: top-``k`` neighbors per query when the
    QUERY side is also large (hard-negative mining, corpus-vs-corpus
    retrieval) — ``knn_join`` broadcasts the query set, which is right for
    eval sets and wrong at corpus scale.

    Plan shape (the dedup.embedding_cosine_pairs skinny-candidate shape,
    operators/dedup.py): both sides compute an LSH signature as a pure
    projection; queries explode to their probe buckets (exact + hamming-1,
    multiprobe recall); candidates come from a SHUFFLED equi-join on the
    bucket id carrying only (id, bucket) — no broadcast of either side, no
    nested loop, and the vectors are attached AFTER candidate generation
    by id (a uniformly distributed key). Exact distances are computed on
    candidates only, then the same two-stage salted top-k as ``knn_join``.
    Recall is probabilistic-LSH by construction; ``planes`` width trades
    recall for candidate volume (operators.ann.auto_num_planes)."""
    from . import ann as A

    if k < 0:
        raise ValueError("k must be >= 0")
    qv = query_vector_col or vector_col
    qsig = queries.select(
        F.col(query_id), A.lsh_signature(qv, planes).alias("sig")
    )
    probes = F.array(
        F.col("sig"), *[F.col("sig").bitwiseXOR(F.lit(1 << p)) for p in range(len(planes))]
    )
    # skinny fan-out: (query_id, bucket) only — probe values are distinct,
    # so a pair within hamming-1 joins exactly once
    qprobe = qsig.select(F.col(query_id), F.explode(probes).alias("bucket"))
    csig = corpus.select(
        F.col(corpus_id), A.lsh_signature(vector_col, planes).alias("bucket")
    )
    cand = qprobe.join(csig, on="bucket").select(query_id, corpus_id)
    qvecs = queries.select(F.col(query_id), F.col(qv).cast("array<double>").alias("__qv"))
    cvecs = corpus.select(F.col(corpus_id), F.col(vector_col).cast("array<double>").alias("__cv"))
    scored = cand.join(qvecs, on=query_id).join(cvecs, on=corpus_id)
    dist = V.distance(F.col("__cv"), F.col("__qv"), metric)
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    skinny = scored.select(F.col(query_id), F.col(corpus_id), dist.alias(distance_col))
    return _topk_per_query(skinny, query_id, corpus_id, distance_col, k, salt_partitions)


def knn_per_group(
    df: DataFrame,
    vector_col: str,
    query: Sequence[float],
    group_col: str,
    k: int = 10,
    metric: str = "l2",
    distance_col: str = "_distance",
    tiebreak_cols: Sequence[str] = (),
    round_digits: int | None = None,
) -> DataFrame:
    """Top-k nearest rows to ``query`` WITHIN every ``group_col`` value —
    per-category nearest neighbors in one pass ("the 3 closest docs per
    label/language/source").

    One hash shuffle on the group key + a per-group sort bounded by the
    group's size (window row_number), never a global sort; the distance
    projection is the same unrolled codegen expression as ``knn``. Skewed
    groups pay their own sort — for a pathologically hot group, pre-filter
    it and run plain ``knn`` on that slice instead.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    q = V.validate_query_vector(query)
    dist = V.distance(vector_col, q, metric)
    if round_digits is not None:
        dist = F.round(dist, round_digits)
    from pyspark.sql import Window

    order = [F.asc(distance_col), *[F.asc(c) for c in tiebreak_cols]]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn(distance_col, dist)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
