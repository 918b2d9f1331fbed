"""Hybrid retrieval: reciprocal-rank fusion of lexical (BM25) and
vector (KNN) result lists.

The standard answer to "BM25 finds exact keywords, embeddings find
paraphrases — I want both": run each retriever for its top-K, convert
positions to reciprocal ranks, and sum (Cormack et al., RRF, SIGIR'09):

    fused(id) = Σ_leg 1 / (rrf_k + rank_leg(id))

Rank fusion beats score fusion here because BM25 scores and cosine
similarities live on incomparable scales — ranks are scale-free, and
``rrf_k`` (conventionally 60) damps the head so one retriever cannot
monopolize the fused list.

Scale shape: each leg is ALREADY a top-K selection (TakeOrdered for the
scan legs, pruned-postings/index routes for the indexed legs), so fusion
only ever touches ``legs × K`` rows — the rank windows and outer joins
below run on driver-trivial relations regardless of corpus size. Nothing
here re-reads the corpus.

The reference has no hybrid surface (vector-only search — ref
LanceVectorSearch.java); this composes the engine's own BM25 and KNN
operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RRF_K = 60


def with_rank(df: DataFrame, order_cols, rank_col: str = "rank") -> DataFrame:
    """1-based rank by ``order_cols`` (pass explicit asc/desc Columns;
    include the id as the last key so ranks are deterministic). Single-
    partition window — only ever applied to a top-K leg (K rows)."""
    return df.withColumn(rank_col, F.row_number().over(Window.orderBy(*order_cols)))


def rrf_fuse(legs: "list[tuple[DataFrame, str]]", k: int = 10,
             rrf_k: int = RRF_K, out_id: str = "id") -> DataFrame:
    """Fuse ranked legs into the top-k by reciprocal-rank sum.

    ``legs`` is ``[(df, id_col), ...]`` where each df carries a 1-based
    ``rank`` column (see ``with_rank``). Legs are combined with FULL
    OUTER joins and the contributions added left-to-right in leg order —
    a fixed float operator tree, so results are reproducible and can be
    mirrored by a SQL oracle exactly. Returns ``(out_id, rrf)``
    descending, ties on id.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    if k < 0 or rrf_k <= 0:
        raise ValueError("k must be >= 0 and rrf_k positive")
    acc = None
    for i, (df, id_col) in enumerate(legs):
        leg = df.select(
            F.col(id_col).alias(out_id),
            (F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
             ).alias(f"__rrf{i}"),
        )
        acc = leg if acc is None else acc.join(leg, on=out_id, how="full_outer")
    total = None
    for i in range(len(legs)):
        part = F.coalesce(F.col(f"__rrf{i}"), F.lit(0.0))
        total = part if total is None else total + part
    fused = acc.select(out_id, F.round(total, 6).alias("rrf"))
    return fused.orderBy(F.desc("rrf"), F.asc(out_id)).limit(k)


def hybrid_search(docs: DataFrame, text_col: str, doc_id_col: str,
                  query: str, emb: DataFrame, vector_col: str,
                  vec_id_col: str, query_vector, k: int = 10,
                  leg_k: int = 20, rrf_k: int = RRF_K,
                  metric: str = "cosine",
                  vec_leg: DataFrame | None = None) -> DataFrame:
    """Full-scan hybrid search: BM25 leg + exact-KNN leg, RRF-fused.

    Both id columns must address the same document space. Returns
    ``(id, rrf)``. The indexed twin (FTS postings + ANN index legs) is
    ``hybrid_search_indexed`` — identical fusion, sub-linear legs.

    ``vec_leg``: a precomputed vector leg — (``vec_id_col``,
    ``_distance``) already truncated to the top ``leg_k`` by
    (distance, id). Callers that compute several metrics from ONE corpus
    scan (queries.knn.knn_l2_dot) pass their shared leg here instead of
    paying ``knn`` a second scan; ranks (and thus fusion) are identical
    because the rank keys are the same (distance, id) pairs.
    """
    from .knn import knn
    from .text import bm25_search

    lex = with_rank(
        bm25_search(docs, text_col, doc_id_col, query, k=leg_k),
        [F.desc("bm25"), F.asc(doc_id_col)],
    )
    if vec_leg is None:
        vec_leg = knn(emb, vector_col, query_vector, k=leg_k, metric=metric,
                      tiebreak_cols=[vec_id_col], round_digits=6)
    vec = with_rank(vec_leg, [F.asc("_distance"), F.asc(vec_id_col)])
    return rrf_fuse([(vec, vec_id_col), (lex, doc_id_col)], k=k, rrf_k=rrf_k)


def hybrid_search_indexed(spark, docs_path: str, query: str, emb: DataFrame,
                          vector_col: str, vec_id_col: str, query_vector,
                          text_col: str = "text", k: int = 10,
                          leg_k: int = 20, rrf_k: int = RRF_K,
                          metric: str = "cosine",
                          lex_post: "DataFrame | None" = None) -> DataFrame:
    """Hybrid search with the lexical leg served from the FTS inverted
    index (sources/fts.py — IO bounded by the query terms' postings).
    Identical to ``hybrid_search`` whenever >= leg_k documents match the
    lexical query (the FTS candidate-set contract). Oracle-gated as the
    ``hybrid`` branch of the ``vector_search_udtf`` registered query
    (queries/knn.py) — hash-checked against a DuckDB full-scan RRF CTE;
    ``tests/test_retrieval.py`` additionally pins it row-identical to
    the full-scan twin."""
    from ..sources.fts import fts_index_path, fts_search
    from ..sources import fragments as FR
    from .knn import knn

    try:
        info = FR.read_manifest(fts_index_path(docs_path, text_col)).meta.get("fts")
    except FileNotFoundError:
        info = None
    if not info:
        raise ValueError(f"no fts index for {text_col!r} at {docs_path} — "
                         "create_fts_index first (hybrid_search is the "
                         "index-free full-scan twin)")
    id_col = info["id_col"]
    # lex_post: the fts_search _post hook forwarded (one shared postings
    # scan when the caller runs several same-query searches in one plan)
    lex = with_rank(
        fts_search(spark, docs_path, query, text_col=text_col, k=leg_k,
                   _post=lex_post),
        [F.desc("bm25"), F.asc(id_col)],
    )
    vec = with_rank(
        knn(emb, vector_col, query_vector, k=leg_k, metric=metric,
            tiebreak_cols=[vec_id_col], round_digits=6),
        [F.asc("_distance"), F.asc(vec_id_col)],
    )
    return rrf_fuse([(vec, vec_id_col), (lex, id_col)], k=k, rrf_k=rrf_k)


def rerank_topk(candidates: DataFrame, candidate_id_col: str,
                docs: DataFrame, text_col: str, doc_id_col: str,
                query: str, k: int = 10, scorer=None) -> DataFrame:
    """Second-stage reranking: re-score a retrieval candidate list
    against the query and keep the top-k.

    The standard retrieve-then-rerank shape: a cheap first stage
    (hybrid/FTS/ANN) returns N candidates, an expensive pairwise scorer
    re-orders them. ``candidates`` is K-row, so the doc fetch is a
    broadcast semi-join into the corpus scan (pushdown-friendly), and
    scoring touches exactly N rows — the corpus is never re-scored.

    ``scorer(texts: pandas.Series, query: str) -> pandas.Series[float]``
    is the cross-encoder hook, executed through an Arrow-batched
    ``mapInPandas`` (model-inference batch shape; no per-row Python).
    The default is a deterministic lexical-overlap proxy (token Jaccard
    against the query) — dependency-free stand-in that keeps the
    plumbing real and testable where no model runtime exists, same
    stub contract as operators/multimodal's decode.

    Returns ``(id, rerank_score)`` descending, ties on id. Oracle-gated
    as the ``rerank`` branch of the ``vector_search_udtf`` registered
    query (queries/knn.py): the default Jaccard scorer is mirrored in
    DuckDB as list_intersect/list_distinct set arithmetic over the FTS
    top-10 candidate set.
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    q_terms = [t for t in query.split(" ") if t]
    if not q_terms:
        raise ValueError("empty query")

    cand_ids = candidates.select(F.col(candidate_id_col).alias(doc_id_col))
    pairs = docs.join(F.broadcast(cand_ids), on=doc_id_col, how="left_semi") \
                .select(doc_id_col, text_col)

    if scorer is None:
        def scorer(texts, q=query):  # noqa: ANN001 — pandas Series in/out
            qs = set(q.split(" "))
            def jac(t):
                ts = set(str(t).split(" "))
                u = len(ts | qs)
                return len(ts & qs) / u if u else 0.0
            return texts.map(jac)

    id_type = docs.schema[doc_id_col].dataType.simpleString()
    out_schema = f"{doc_id_col} {id_type}, rerank_score double"

    def _score(batches):
        import numpy as np
        import pandas as pd

        # HALF_UP, not pandas' half-even: the oracle mirror (DuckDB
        # round) and Spark's F.round both round halves away from zero —
        # a Jaccard like 1/128 = 0.0078125 sits EXACTLY on the 6-decimal
        # half boundary and would flip the hash gate under banker's
        # rounding (same divergence class udtf._round_half_up6 closes
        # for the vector distances)
        from ..udtf import _round_half_up6

        for pdf in batches:
            raw = np.asarray(scorer(pdf[text_col], query), dtype="float64")
            yield pd.DataFrame({
                doc_id_col: pdf[doc_id_col],
                "rerank_score": pd.Series(_round_half_up6(raw)),
            })

    scored = pairs.mapInPandas(_score, schema=out_schema)
    return scored.orderBy(F.desc("rerank_score"), F.asc(doc_id_col)).limit(k)
