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


# hybrid-RRF branch of knn_l2_dot: a lexical BM25 leg over documents
# fused with the cosine leg over embeddings (doc_id and vec_id address
# the same id space in the corpus). Same fixed three-term query and the
# same BM25 operator tree as text_stats' oracle — rebuilt locally rather
# than imported from queries.pipeline so the module import (and thus the
# driver's registration) order stays untouched.
_RRF_TERMS = ["vector", "hash", "join"]
_RRF_LEG_K = 20
_RRF_KCONST = 60
# phrase branch: a fixed consecutive 2-gram present at every tested sf
# (47 docs at sf0.001, 27 at sf0.01); BM25 constants repr()-ed so both
# engines parse identical doubles (same convention as _rrf_bm25_sql)
_PHRASE_W1, _PHRASE_W2 = "order", "fast"
from ..operators.text import BM25_B as _BM25_B, BM25_K1 as _BM25_K1  # noqa: E402

_RRF_K1P1 = repr(_BM25_K1 + 1.0)
_RRF_K1R = repr(_BM25_K1)
_RRF_1MB = repr(1.0 - _BM25_B)
_RRF_BR = repr(_BM25_B)


def _rrf_bm25_sql() -> str:
    k1p1, one_m_b, k1r, br = _RRF_K1P1, _RRF_1MB, _RRF_K1R, _RRF_BR
    contribs = []
    for i, t in enumerate(_RRF_TERMS):
        tf = f"CAST(len(list_filter(ws, x -> x = '{t}')) AS DOUBLE)"
        idf = f"ln(1.0 + (st.n - st.df{i} + 0.5) / (st.df{i} + 0.5))"
        contribs.append(
            f"{idf} * ({tf} * {k1p1}) / ({tf} + {k1r} * "
            f"({one_m_b} + {br} * CAST(len(ws) AS DOUBLE) / st.avgdl))"
        )
    return " + ".join(contribs)


def _rrf_df_sql() -> str:
    return ", ".join(
        f"sum(CASE WHEN list_contains(ws, '{t}') THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(_RRF_TERMS)
    )


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
    ),
    b0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    st AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl, {_rrf_df_sql()} FROM b0),
    bm_top AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        FROM (SELECT doc_id, round({_rrf_bm25_sql()}, 6) AS s
              FROM b0 CROSS JOIN st)
        ORDER BY s DESC, doc_id LIMIT {_RRF_LEG_K}
    ),
    cos_top AS (
        SELECT vec_id, row_number() OVER (ORDER BY d, vec_id) AS r
        FROM (SELECT vec_id, {_COS} AS d FROM embeddings, qv)
        ORDER BY d, vec_id LIMIT {_RRF_LEG_K}
    ),
    fused AS (
        SELECT coalesce(c.vec_id, b.doc_id) AS id,
               round(coalesce(1.0 / ({_RRF_KCONST} + c.r), 0.0)
                     + coalesce(1.0 / ({_RRF_KCONST} + b.r), 0.0), 6) AS f
        FROM cos_top c FULL OUTER JOIN bm_top b ON c.vec_id = b.doc_id
    )
    SELECT 'l2' AS metric, vec_id, _distance,
           round(1.0 / (1.0 + _distance), 6) AS similarity
    FROM l2_top
    UNION ALL
    SELECT 'dot' AS metric, vec_id, _distance,
           round(1.0 / (1.0 + _distance), 6) AS similarity
    FROM dot_top
    UNION ALL
    SELECT 'rrf' AS metric, id AS vec_id, round(-f, 6) AS _distance,
           f AS similarity
    FROM (SELECT id, f FROM fused ORDER BY f DESC, id LIMIT 10)
    """,
    doc="Exact KNN, L2 + dot metrics in one tagged result, k=10 each "
        "(ref LanceVectorSearch.java:121-210; config/LanceOptions.java:323-346). "
        "Dot is the negated dot product (smaller = closer); similarity is the "
        "1/(1+d) score of ref LanceVectorSearch.java:420-426. Each branch "
        "compiles to TakeOrdered (per-partition top-k, no global sort). "
        "The 'rrf' branch is hybrid retrieval (operators.retrieval."
        "hybrid_search): a BM25 top-20 lexical leg over documents fused "
        "with the cosine top-20 vector leg by reciprocal-rank fusion "
        "(1/(60+rank), Cormack SIGIR'09) — fusion touches only legs x K "
        "rows; _distance is the negated fused score so smaller = closer. "
        "tests/test_retrieval.py pins the FTS-indexed twin "
        "(hybrid_search_indexed) to these exact rows.",
)
def knn_l2_dot(spark, sf_dir):
    from ..functions import vector as V
    from ..operators.retrieval import hybrid_search

    e = load_table(spark, sf_dir, "embeddings")
    # ONE corpus scan computes all three metrics into a skinny
    # (id, d_l2, d_dot, d_cos) relation, materialized once
    # (localCheckpoint — a Union has no cross-branch subtree reuse, so the
    # three top-k legs would otherwise each re-scan the vectors and
    # re-evaluate a 64-dim distance chain: 3 full passes -> 1 at any
    # corpus size; the skinny relation is ~32B/row vs ~520B vectors).
    # Expressions are the exact ones knn() builds (V.distance + round 6),
    # and each leg orders by (rounded distance, vec_id) — the same total
    # order — so rows and the fused ranks are identical to the per-leg
    # formulation.
    dists = e.select(
        "vec_id",
        F.round(V.distance("embedding", QVEC, "l2"), 6).alias("__l2"),
        F.round(V.distance("embedding", QVEC, "dot"), 6).alias("__dot"),
        F.round(V.distance("embedding", QVEC, "cosine"), 6).alias("__cos"),
    ).localCheckpoint(eager=False)
    out = []
    for metric, c in (("l2", "__l2"), ("dot", "__dot")):
        top = dists.orderBy(F.asc(c), F.asc("vec_id")).limit(10)
        out.append(top.select(
            F.lit(metric).alias("metric"), "vec_id",
            F.col(c).alias("_distance"),
            # V.similarity over the rounded distance, rounded to 6 — the
            # exact operator tree of knn(with_similarity=True) + round
            F.round(V.similarity(F.col(c)), 6).alias("similarity")))
    d = load_table(spark, sf_dir, "documents")
    cos_leg = (dists.orderBy(F.asc("__cos"), F.asc("vec_id")).limit(_RRF_LEG_K)
               .select("vec_id", F.col("__cos").alias("_distance")))
    fused = hybrid_search(
        d, "text", "doc_id", " ".join(_RRF_TERMS),
        e, "embedding", "vec_id", QVEC,
        k=10, leg_k=_RRF_LEG_K, rrf_k=_RRF_KCONST,
        vec_leg=cos_leg,
    )
    out.append(fused.select(
        F.lit("rrf").alias("metric"),
        F.col("id").alias("vec_id"),
        F.round(-F.col("rrf"), 6).alias("_distance"),
        F.col("rrf").alias("similarity")))
    return out[0].unionAll(out[1]).unionAll(out[2])


@register(
    "knn_cosine",
    oracle=_oracle(_COS),
    doc="Exact KNN, cosine metric (ref config/LanceOptions.java:323-346).",
)
def knn_cosine(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    return knn(e, "embedding", QVEC, k=10, metric="cosine",
               tiebreak_cols=["vec_id"], round_digits=6).select("vec_id", "_distance")


# LSH branch of knn_join_batch: large-query-side join bucketing (shared
# plane literals with the oracle; 4 planes on the 64-dim corpus)
from ..operators import ann as _ANN  # noqa: E402

_JOIN_PLANES = _ANN.make_planes(num_planes=4, dim=64)


def _join_planes_sql() -> str:
    return ", ".join(
        "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[] AS p" + str(p)
        for p, plane in enumerate(_JOIN_PLANES)
    )


def _join_sig_sql(vec: str) -> str:
    return " + ".join(
        f"(CASE WHEN list_sum(list_transform({vec}, (x,i) -> x * p{p}[i])) > 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p in range(len(_JOIN_PLANES))
    )


@register(
    "knn_join_batch",
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q),
    pl AS (SELECT {_join_planes_sql()}),
    q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
               ({_join_sig_sql('embedding::DOUBLE[]')}) AS sig
        FROM embeddings, pl WHERE vec_id < 5
    ),
    c AS (
        SELECT vec_id, embedding::DOUBLE[] AS cv,
               ({_join_sig_sql('embedding::DOUBLE[]')}) AS sig
        FROM embeddings, pl WHERE vec_id >= 5
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
    ),
    probes AS (
        SELECT query_id, unnest([sig{"".join(f", xor(sig, {1 << p})" for p in range(len(_JOIN_PLANES)))}]) AS bucket
        FROM q
    ),
    lcand AS (
        SELECT p.query_id, c.vec_id FROM probes p JOIN c ON p.bucket = c.sig
    ),
    ld AS (
        SELECT lcand.query_id, lcand.vec_id,
               round(sqrt(list_sum(list_transform(c.cv,
                   (x, i) -> (x - q.qv[i]) * (x - q.qv[i])))), 6) AS _distance
        FROM lcand
        JOIN q ON lcand.query_id = q.query_id
        JOIN c ON lcand.vec_id = c.vec_id
    ),
    lr AS (
        SELECT query_id, vec_id, _distance,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY _distance, vec_id) AS rn
        FROM ld
    ),
    g AS (
        SELECT label, vec_id, _distance,
               row_number() OVER (PARTITION BY label
                                  ORDER BY _distance, vec_id) AS rn
        FROM (SELECT label, vec_id, {_COS} AS _distance FROM embeddings, qv)
    )
    SELECT 'exact' AS kind, query_id, vec_id, _distance FROM r WHERE rn <= 3
    UNION ALL
    SELECT 'lsh' AS kind, query_id, vec_id, _distance FROM lr WHERE rn <= 3
    UNION ALL
    SELECT 'per_label' AS kind, CAST(label AS BIGINT) AS query_id,
           vec_id, _distance
    FROM g WHERE rn <= 3
    """,
    doc="Batch similarity search (k-NN join) in two tagged branches: "
        "'exact' — top-3 corpus neighbors for each of 5 query vectors, "
        "queries broadcast, distances map-side, two-stage salted top-k "
        "(operators.knn.knn_join) — the small-eval-set path; 'lsh' — the "
        "same join through knn_join_lsh, the corpus-vs-corpus path: both "
        "sides LSH-bucketed, candidates from a shuffled equi-join on the "
        "bucket id (NO broadcast of either side — plan pinned), vectors "
        "attached after candidate generation, exact distances on "
        "candidates only. The oracle mirrors the identical bucketing so "
        "both branches hash-match.",
)
def knn_join_batch(spark, sf_dir):
    from ..operators.knn import knn_join_lsh

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = e.filter(F.col("vec_id") >= 5)
    exact = knn_join(corpus, queries, "embedding", k=3, metric="l2").select(
        F.lit("exact").alias("kind"), "query_id", "vec_id", "_distance"
    )
    lsh = knn_join_lsh(corpus, queries, "embedding", k=3, planes=_JOIN_PLANES,
                       metric="l2").select(
        F.lit("lsh").alias("kind"), "query_id", "vec_id", "_distance"
    )
    # per-group branch: top-3 cosine neighbors of QVEC within every label
    # (operators.knn.knn_per_group — one hash shuffle on the group key +
    # per-group bounded sort, never a global sort); label doubles as the
    # query_id so all three branches share one schema
    from ..operators.knn import knn_per_group

    per = knn_per_group(e, "embedding", QVEC, "label", k=3, metric="cosine",
                        tiebreak_cols=["vec_id"], round_digits=6).select(
        F.lit("per_label").alias("kind"),
        F.col("label").cast("long").alias("query_id"),
        "vec_id", "_distance",
    )
    return exact.unionByName(lsh).unionByName(per)


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
    oracle=f"""
    WITH qv AS (SELECT {_QSQL} AS q),
    vec AS (
        SELECT vec_id AS id, _distance AS score
        FROM (SELECT vec_id, {_L2} AS _distance FROM embeddings, qv)
        ORDER BY _distance, vec_id LIMIT 10
    ),
    b0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    st AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl, {_rrf_df_sql()} FROM b0),
    txt AS (
        SELECT doc_id AS id, s AS score
        FROM (SELECT doc_id, round({_rrf_bm25_sql()}, 6) AS s
              FROM b0 CROSS JOIN st)
        WHERE s > 0
        ORDER BY s DESC, doc_id LIMIT 10
    ),
    ph AS (
        SELECT doc_id,
               CAST(len(list_filter(generate_series(1, len(ws)-1),
                    i -> ws[i] = '{_PHRASE_W1}' AND ws[i+1] = '{_PHRASE_W2}'))
                    AS DOUBLE) AS ptf,
               CAST(len(ws) AS DOUBLE) AS dl
        FROM b0
    ),
    phm AS (SELECT * FROM ph WHERE ptf > 0),
    pst AS (SELECT CAST(count(*) AS DOUBLE) AS pdf FROM phm),
    phr AS (
        SELECT doc_id AS id,
               round(ln(1.0 + (st.n - pst.pdf + 0.5) / (pst.pdf + 0.5))
                     * (ptf * {_RRF_K1P1}) / (ptf + {_RRF_K1R} *
                       ({_RRF_1MB} + {_RRF_BR} * dl / st.avgdl)), 6) AS score
        FROM phm CROSS JOIN pst CROSS JOIN st
        ORDER BY score DESC, doc_id LIMIT 10
    ),
    txta AS (
        SELECT doc_id AS id, s AS score
        FROM (SELECT doc_id, ws, round({_rrf_bm25_sql()}, 6) AS s
              FROM b0 CROSS JOIN st)
        WHERE {" AND ".join(f"list_contains(ws, '{t}')" for t in _RRF_TERMS)}
        ORDER BY s DESC, doc_id LIMIT 10
    ),
    bm_top AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        FROM (SELECT doc_id, round({_rrf_bm25_sql()}, 6) AS s
              FROM b0 CROSS JOIN st)
        ORDER BY s DESC, doc_id LIMIT {_RRF_LEG_K}
    ),
    cos_top AS (
        SELECT vec_id, row_number() OVER (ORDER BY d, vec_id) AS r
        FROM (SELECT vec_id, {_COS} AS d FROM embeddings, qv)
        ORDER BY d, vec_id LIMIT {_RRF_LEG_K}
    ),
    fused AS (
        SELECT coalesce(c.vec_id, b.doc_id) AS id,
               round(coalesce(1.0 / ({_RRF_KCONST} + c.r), 0.0)
                     + coalesce(1.0 / ({_RRF_KCONST} + b.r), 0.0), 6) AS f
        FROM cos_top c FULL OUTER JOIN bm_top b ON c.vec_id = b.doc_id
    ),
    hyb AS (SELECT id, f AS score FROM fused ORDER BY f DESC, id LIMIT 10),
    qd AS (SELECT {str(list(_RRF_TERMS)).replace('"', "'")} AS q),
    rr AS (
        SELECT t.id,
               round(CAST(len(list_intersect(list_distinct(b.ws), qd.q))
                          AS DOUBLE)
                     / len(list_distinct(list_concat(b.ws, qd.q))), 6)
                   AS score
        FROM txt t JOIN b0 b ON b.doc_id = t.id CROSS JOIN qd
        ORDER BY score DESC, t.id LIMIT 10
    )
    SELECT 'vec' AS kind, id, score FROM vec
    UNION ALL
    SELECT 'text' AS kind, id, score FROM txt
    UNION ALL
    SELECT 'phrase' AS kind, id, score FROM phr
    UNION ALL
    SELECT 'text_all' AS kind, id, score FROM txta
    UNION ALL
    SELECT 'hybrid' AS kind, id, score FROM hyb
    UNION ALL
    SELECT 'rerank' AS kind, id, score FROM rr
    """,
    doc="SQL table-function path, both search modalities as session-scope "
        "UDTFs with analyze()-derived schemas (dataset schema + score "
        "column). 'vec' branch: SELECT ... FROM vector_search(path, col, "
        "ARRAY[...], k, metric) (ref table/LanceVectorSearchFunction.java:"
        "71-357). 'text' branch: SELECT ... FROM text_search(path, col, "
        "query, k) served from the FTS inverted index (sources/fts.py) "
        "built inside the query — the udtf reads ONLY the query terms' "
        "postings (manifest zone-map + bloom fragment pruning, pyarrow "
        "row-group pruning) and reproduces the full-scan BM25 scores the "
        "oracle computes, bit-identically before rounding. 'phrase' "
        "branch: positional phrase search (sources.fts.fts_search_phrase) "
        "— consecutive-token match via an array_intersect chain over "
        "shifted position arrays, BM25-scored as a pseudo-term; the "
        "oracle recomputes the phrase tf from the raw token arrays. "
        "'text_all' branch: boolean-AND semantics "
        "(fts_search(match_all=True)) — only documents containing every "
        "query term rank, scores unchanged. 'hybrid' branch: "
        "operators.retrieval.hybrid_search_indexed — FTS-postings "
        "lexical leg + cosine KNN leg, RRF-fused (1/(60+rank)); equals "
        "the full-scan hybrid whenever >= leg_k docs match the query. "
        "'rerank' branch: retrieve-then-rerank "
        "(operators.retrieval.rerank_topk) — the FTS top-10 candidates "
        "re-scored by the deterministic token-Jaccard scorer through an "
        "Arrow-batched mapInPandas (broadcast semi-join fetch; the "
        "corpus is never re-scored), mirrored in the oracle as "
        "list_intersect/list_distinct set arithmetic.",
)
def vector_search_udtf(spark, sf_dir):
    from ..sources.datasource import register_lance_datasource
    from ..sources.fts import create_fts_index
    from ..udtf import register_text_search, register_vector_search

    register_vector_search(spark)
    path = f"{sf_dir}/embeddings.parquet"
    qarr = "array(" + ", ".join(f"double({v})" for v in QVEC) + ")"
    vec = spark.sql(f"""
        SELECT 'vec' AS kind, vec_id AS id, round(_distance, 6) AS score
        FROM vector_search('{path}', 'embedding', {qarr}, 10, 'l2')
    """)

    # text branch: documents -> fragment dataset + FTS index, searched
    # through the SQL route. The docs dataset is rebuilt per call (same
    # _workdir convention as the sources_q queries).
    register_lance_datasource(spark)
    register_text_search(spark)
    # runtime import: sources_q registers AFTER this module — a top-level
    # import would reorder the driver-visible registration sequence
    from .sources_q import _workdir

    droot = _workdir("ftsudtf", sf_dir)
    # native two-phase write (sources/writer.py): same manifest-committed
    # dataset the format('lance') sink produces, without the Python
    # ArrowWriter worker per task — the datasource WRITE capability stays
    # demonstrated (and gated) by source_format_api
    from ..sources.writer import write_dataset

    write_dataset(load_table(spark, sf_dir, "documents")
                  .select("doc_id", "text"), droot, mode="overwrite")
    create_fts_index(spark, droot, "text", "doc_id", with_positions=True)
    txt = spark.sql(f"""
        SELECT 'text' AS kind, doc_id AS id, bm25 AS score
        FROM text_search('{droot}', 'text', '{" ".join(_RRF_TERMS)}', 10)
    """).filter(F.col("score") > 0)
    # phrase branch: positional postings, consecutive-token match
    from ..sources.fts import (
        _postings_scan,
        analyze_query,
        fts_index_path,
        fts_search,
        fts_search_phrase,
    )

    phr = fts_search_phrase(
        spark, droot, f"{_PHRASE_W1} {_PHRASE_W2}", k=10
    ).select(F.lit("phrase").alias("kind"), F.col("doc_id").alias("id"),
             F.col("bm25").alias("score"))
    query = " ".join(_RRF_TERMS)
    # three of the branches below (text_all, hybrid's lexical leg, the
    # rerank candidates) search the SAME query — share ONE materialized
    # pruned-postings scan via the fts_search _post hook instead of
    # scanning the postings fragments three times in the union's plan
    # (scores identical: same relation; pinned by tests/test_opt_r14.py)
    q_terms = list(dict.fromkeys(analyze_query(query)))
    post_shared = _postings_scan(
        spark, fts_index_path(droot, "text"), q_terms,
        ["term", "id", "tf", "dl"], None).localCheckpoint(eager=False)
    # text_all branch: boolean-AND fts_search(match_all=True) — only
    # documents containing EVERY query term are ranked, scores unchanged
    txta = fts_search(spark, droot, query, k=10, match_all=True,
                      _post=post_shared).select(
        F.lit("text_all").alias("kind"), F.col("doc_id").alias("id"),
        F.col("bm25").alias("score"))
    # hybrid branch: operators.retrieval.hybrid_search_indexed — the
    # lexical leg served from the SAME postings index (IO bounded by the
    # query terms' postings), fused with the cosine KNN leg by RRF;
    # identical rows to knn_l2_dot's full-scan 'rrf' branch because
    # >= leg_k documents match the lexical query at every tested sf
    from ..operators.retrieval import hybrid_search_indexed, rerank_topk

    e = load_table(spark, sf_dir, "embeddings")
    hyb = hybrid_search_indexed(
        spark, droot, query, e, "embedding", "vec_id", QVEC,
        text_col="text", k=10, leg_k=_RRF_LEG_K, rrf_k=_RRF_KCONST,
        metric="cosine", lex_post=post_shared,
    ).select(F.lit("hybrid").alias("kind"), "id", F.col("rrf").alias("score"))
    # rerank branch: retrieve-then-rerank — the FTS top-10 candidates
    # re-scored by the deterministic token-Jaccard scorer (the
    # cross-encoder stand-in), corpus never re-scored
    cand = fts_search(spark, droot, query, k=10, _post=post_shared)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rr = rerank_topk(cand, "doc_id", docs, "text", "doc_id", query, k=10) \
        .select(F.lit("rerank").alias("kind"), F.col("doc_id").alias("id"),
                F.col("rerank_score").alias("score"))
    return (vec.unionAll(txt).unionAll(phr)
            .unionAll(txta).unionAll(hyb).unionAll(rr))
