"""FTS inverted index (sources/fts.py): build/search/refresh semantics,
score parity with the full-scan bm25_search, and the pruned-IO contract
(un-matching fragments are never scheduled for a term point lookup)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators.text import bm25_search
from flink_connector_lance_spark.sources import fragments as FR
from flink_connector_lance_spark.sources.datasource import (
    In,
    LanceDataSourceReader,
    register_lance_datasource,
)
from flink_connector_lance_spark.sources.fts import (
    create_fts_index,
    fts_index_path,
    fts_search,
    refresh_fts_index,
)

QUERY = "vector hash join"


@pytest.fixture()
def corpus(spark, tmp_path, sf_dir):
    """Documents written as a fragment dataset (4 fragments)."""
    register_lance_datasource(spark)
    path = str(tmp_path / "docs")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.repartitionByRange(4, "doc_id").write.format("lance").mode("overwrite").save(path)
    return path


def _ranked_rows(df):
    return [(r[0], r[1]) for r in df.collect()]


def test_build_and_search_matches_full_scan(spark, corpus, sf_dir):
    out = create_fts_index(spark, corpus, "text", "doc_id")
    d = load_table(spark, sf_dir, "documents")
    assert out["n_docs"] == d.count()

    got = _ranked_rows(fts_search(spark, corpus, QUERY, k=10))
    want = _ranked_rows(bm25_search(d, "text", "doc_id", QUERY, k=10))
    # parity holds when >= k documents match the query (scores > 0)
    assert all(s > 0 for _, s in want), "fixture query must match >= k docs"
    assert got == want  # ids AND scores identical (bit-parity pre-round)


def test_search_single_term_and_missing_term(spark, corpus, sf_dir):
    create_fts_index(spark, corpus, "text", "doc_id")
    d = load_table(spark, sf_dir, "documents")
    got = _ranked_rows(fts_search(spark, corpus, "vector", k=5))
    want = _ranked_rows(bm25_search(d, "text", "doc_id", "vector", k=5))
    assert got == want
    # a term absent from the corpus: empty result (full scan would emit
    # k zero-score rows; the index documents the difference)
    assert fts_search(spark, corpus, "zzzznotaterm", k=5).count() == 0
    with pytest.raises(ValueError, match="empty query"):
        fts_search(spark, corpus, "   ")


def test_search_without_index_raises(spark, corpus):
    with pytest.raises(ValueError, match="create_fts_index"):
        fts_search(spark, corpus, "vector")


def test_postings_are_term_clustered_and_pruned(spark, corpus):
    create_fts_index(spark, corpus, "text", "doc_id", max_rows_per_fragment=3000)
    idx = fts_index_path(corpus, "text")
    m = FR.read_manifest(idx)
    assert len(m.fragments) > 1, "clustered write should emit several fragments"
    # a single-term lookup must NOT schedule every fragment: the range-
    # clustered layout gives fragments disjoint term ranges
    r = LanceDataSourceReader({"path": idx})
    r.pushFilters([In(("term",), ("vector",))])
    planned = len(r.partitions())
    assert planned < len(m.fragments), (
        f"term point lookup planned {planned}/{len(m.fragments)} fragments")


def test_refresh_incremental_append(spark, corpus, sf_dir):
    create_fts_index(spark, corpus, "text", "doc_id")
    assert refresh_fts_index(spark, corpus, "text")["mode"] == "noop"

    # append a delta with a doc_id offset so ids stay unique
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.limit(50).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    delta.write.format("lance").mode("append").save(corpus)

    out = refresh_fts_index(spark, corpus, "text")
    assert out["mode"] == "incremental"
    assert out["delta_docs"] == 50

    # post-refresh scores match a full scan over the grown corpus
    grown = spark.read.format("lance").load(corpus)
    got = _ranked_rows(fts_search(spark, corpus, QUERY, k=10))
    want = _ranked_rows(bm25_search(grown, "text", "doc_id", QUERY, k=10))
    assert got == want


def test_refresh_full_on_rewrite(spark, corpus):
    from flink_connector_lance_spark.sources.maintenance import delete_rows

    create_fts_index(spark, corpus, "text", "doc_id")
    delete_rows(spark, corpus, "doc_id < 10")
    out = refresh_fts_index(spark, corpus, "text")
    assert out["mode"] == "full"
    grown = spark.read.format("lance").load(corpus)
    got = _ranked_rows(fts_search(spark, corpus, QUERY, k=10))
    want = _ranked_rows(bm25_search(grown, "text", "doc_id", QUERY, k=10))
    assert got == want


def test_refresh_without_index_raises(spark, corpus):
    with pytest.raises((ValueError, FileNotFoundError)):
        refresh_fts_index(spark, corpus, "text")


def test_text_search_udtf_matches_fts_search(spark, corpus, sf_dir):
    from flink_connector_lance_spark.udtf import register_text_search

    create_fts_index(spark, corpus, "text", "doc_id")
    register_text_search(spark)
    got = spark.sql(
        f"SELECT doc_id, bm25 FROM text_search('{corpus}', 'text', '{QUERY}', 5)"
    ).collect()
    want = fts_search(spark, corpus, QUERY, k=5).collect()
    assert [(r["doc_id"], r["bm25"]) for r in got] == [tuple(r) for r in want]
    # full document row rides along (SQL users get the text back)
    one = spark.sql(
        f"SELECT * FROM text_search('{corpus}', 'text', '{QUERY}', 1)").collect()[0]
    assert list(one.asDict()) == ["doc_id", "text", "bm25", "snippet"]
    # the snippet centers on a query-term hit
    assert any(t in one["snippet"].split(" ") or t in one["snippet"]
               for t in QUERY.split(" "))


def test_text_search_udtf_validation(spark, corpus):
    from flink_connector_lance_spark.udtf import register_text_search

    create_fts_index(spark, corpus, "text", "doc_id")
    register_text_search(spark)
    with pytest.raises(Exception, match="empty query"):
        spark.sql(
            f"SELECT * FROM text_search('{corpus}', 'text', ' ', 5)").collect()
    # absent term -> empty, not an error
    assert spark.sql(
        f"SELECT * FROM text_search('{corpus}', 'text', 'zzzznotaterm', 5)"
    ).count() == 0


def test_describe_and_auto_maintenance_cover_fts(spark, corpus, sf_dir):
    import pyspark.sql.functions as F2

    from flink_connector_lance_spark.sources.auto_maintenance import (
        MaintenancePolicy,
        run_maintenance,
    )
    from flink_connector_lance_spark.sources.maintenance import describe_dataset

    create_fts_index(spark, corpus, "text", "doc_id")
    desc = describe_dataset(corpus)
    assert desc["fts"] and desc["fts"][0]["column"] == "text"
    assert desc["fts"][0]["pending_rows"] == 0
    assert not desc["fts"][0]["needs_full"]

    # append -> pending rows; auto-maintenance refreshes incrementally
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.limit(20).select((F2.col("doc_id") + 2_000_000).alias("doc_id"), "text") \
        .write.format("lance").mode("append").save(corpus)
    desc = describe_dataset(corpus)
    assert desc["fts"][0]["pending_rows"] == 20

    # target=1 row/fragment -> nothing is a runt -> compaction stays off,
    # so the refresh exercises the incremental path (a due compaction
    # would rewrite covered files and correctly force a full rebuild)
    report = run_maintenance(
        spark, corpus,
        MaintenancePolicy(keep_versions=None, target_rows_per_fragment=1))
    fts_steps = [s for s in report["steps"] if s["step"] == "refresh_fts:text"]
    assert fts_steps and fts_steps[0]["due"]
    assert fts_steps[0]["result"]["mode"] == "incremental"
    assert describe_dataset(corpus)["fts"][0]["pending_rows"] == 0


def test_streaming_ingestion_keeps_fts_fresh(spark, tmp_path, sf_dir):
    """Continuously indexed search corpus: each streaming epoch appends
    documents AND incrementally refreshes the FTS index, so a search
    after the stream drains sees the streamed documents."""
    import os

    from flink_connector_lance_spark.streaming.sink import stream_write_dataset

    register_lance_datasource(spark)
    src = str(tmp_path / "incoming")
    path = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from flink_connector_lance_spark.sources.writer import write_dataset

    write_dataset(d, path, mode="overwrite")
    create_fts_index(spark, path, "text", "doc_id")

    streamed = d.limit(30).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text")
    streamed.coalesce(1).write.mode("overwrite").parquet(src + "/b1")
    q = stream_write_dataset(
        spark.readStream.schema("doc_id long, text string").parquet(src + "/*"),
        path, ckpt, trigger_available_now=True, refresh_fts=True,
    )
    q.awaitTermination(120)

    from flink_connector_lance_spark.sources.maintenance import describe_dataset

    assert describe_dataset(path)["fts"][0]["pending_rows"] == 0
    grown = spark.read.format("lance").load(path)
    got = _ranked_rows(fts_search(spark, path, QUERY, k=10))
    want = _ranked_rows(bm25_search(grown, "text", "doc_id", QUERY, k=10))
    assert got == want


def test_cluster_postings_restores_pruning_and_meta(spark, corpus, sf_dir):
    """Append-heavy indexes accumulate term-range-overlapping fragments;
    cluster_dataset on the postings dataset restores tight ranges. The
    'fts' commit meta must survive the rewrite (fragments.commit
    inherits it like the schema), or the rewrite would brick the index."""
    from flink_connector_lance_spark.sources.maintenance import cluster_dataset

    create_fts_index(spark, corpus, "text", "doc_id", max_rows_per_fragment=3000)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for off in (1_000_000, 2_000_000):
        d.limit(40).select((F.col("doc_id") + off).alias("doc_id"), "text") \
            .write.format("lance").mode("append").save(corpus)
        refresh_fts_index(spark, corpus, "text")

    idx = fts_index_path(corpus, "text")
    before = fts_search(spark, corpus, QUERY, k=10).collect()
    m = cluster_dataset(spark, idx, by=["term"], target_rows_per_fragment=3000)
    assert FR.read_manifest(idx).meta.get("fts"), "fts meta lost in rewrite"
    # ranges disjoint again: a term point lookup prunes
    r = LanceDataSourceReader({"path": idx})
    r.pushFilters([In(("term",), ("vector",))])
    assert len(r.partitions()) < len(m.fragments)
    # search identical across the rewrite, and refresh still understands
    # the index (covered-file bookkeeping untouched by index maintenance)
    after = fts_search(spark, corpus, QUERY, k=10).collect()
    assert [tuple(x) for x in before] == [tuple(x) for x in after]
    assert refresh_fts_index(spark, corpus, "text")["mode"] == "noop"


def test_match_all_semantics(spark, corpus, sf_dir):
    """match_all=True keeps only documents containing EVERY query term,
    with unchanged scores for the survivors."""
    create_fts_index(spark, corpus, "text", "doc_id")
    d = load_table(spark, sf_dir, "documents")
    any_rows = fts_search(spark, corpus, QUERY, k=500).collect()
    all_rows = fts_search(spark, corpus, QUERY, k=500, match_all=True).collect()
    assert 0 < len(all_rows) < len(any_rows)
    # survivors: exactly the docs whose text contains all three terms
    want_ids = {
        r["doc_id"] for r in d.collect()
        if all(t in r["text"].split(" ") for t in QUERY.split(" "))
    }
    assert {r["doc_id"] for r in all_rows} == want_ids
    # scores unchanged vs the OR run
    any_scores = {r["doc_id"]: r["bm25"] for r in any_rows}
    for r in all_rows:
        assert r["bm25"] == any_scores[r["doc_id"]]


def test_phrase_search_matches_brute_force(spark, corpus, sf_dir):
    """Positional phrase search vs a Python brute force over the corpus:
    same matching docs, same occurrence counts."""
    from flink_connector_lance_spark.sources.fts import fts_search_phrase

    create_fts_index(spark, corpus, "text", "doc_id", with_positions=True)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = d.collect()

    # pick a 2-gram that actually occurs a handful of times
    from collections import Counter

    grams = Counter()
    for r in rows:
        ts = r["text"].split(" ")
        for a, b in zip(ts, ts[1:]):
            grams[(a, b)] += 1
    (w1, w2), total = next((g, c) for g, c in grams.most_common()
                           if 3 <= c <= 200)
    phrase = f"{w1} {w2}"

    def brute_tf(text):
        ts = text.split(" ")
        return sum(1 for a, b2 in zip(ts, ts[1:]) if a == w1 and b2 == w2)

    want = {r["doc_id"]: brute_tf(r["text"]) for r in rows
            if brute_tf(r["text"]) > 0}
    got = fts_search_phrase(spark, corpus, phrase, k=10_000).collect()
    assert {r["doc_id"]: r["phrase_tf"] for r in got} == want
    # ranked by score desc then id
    scores = [(r["bm25"], -r["doc_id"]) for r in got]
    assert scores == sorted(scores, key=lambda x: (-x[0], -x[1]))


def test_phrase_search_guards(spark, corpus):
    from flink_connector_lance_spark.sources.fts import fts_search_phrase

    create_fts_index(spark, corpus, "text", "doc_id")  # no positions
    with pytest.raises(ValueError, match="with_positions"):
        fts_search_phrase(spark, corpus, "vector hash")
    with pytest.raises(ValueError, match="empty phrase"):
        fts_search_phrase(spark, corpus, "  ")
    # positional rebuild -> repeated-term phrase works (both slots fill
    # from the same posting) and an impossible phrase returns empty
    create_fts_index(spark, corpus, "text", "doc_id", with_positions=True)
    assert fts_search_phrase(
        spark, corpus, "zzznota zzzterms", k=5).count() == 0


def test_phrase_positions_survive_incremental_refresh(spark, corpus, sf_dir):
    from flink_connector_lance_spark.sources.fts import fts_search_phrase

    create_fts_index(spark, corpus, "text", "doc_id", with_positions=True)
    base = {(r["doc_id"], r["phrase_tf"]) for r in
            fts_search_phrase(spark, corpus, "the vector", k=10_000).collect()}
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.limit(25).select((F.col("doc_id") + 7_000_000).alias("doc_id"), "text") \
        .write.format("lance").mode("append").save(corpus)
    out = refresh_fts_index(spark, corpus, "text")
    assert out["mode"] == "incremental"
    grown = {(r["doc_id"], r["phrase_tf"]) for r in
             fts_search_phrase(spark, corpus, "the vector", k=10_000).collect()}
    assert base <= grown  # old matches intact, appended dups found too
    assert len(grown) >= len(base)


def test_simple_analyzer_case_insensitive(spark, tmp_path, sf_dir):
    """analyzer='simple': lowercased alnum-run tokens — a cased/punctuated
    query still matches; brute-force python mirror pins the scores' doc
    set and the analyzer round-trips through refresh."""
    import re

    register_lance_datasource(spark)
    path = str(tmp_path / "cased")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.initcap("text"), F.lit(" TRAILER!")).alias("text"))
    d.write.format("lance").mode("overwrite").save(path)
    create_fts_index(spark, path, "text", "doc_id", analyzer="simple")

    got = fts_search(spark, path, "VECTOR, Hash; join", k=10_000).collect()
    want_ids = set()
    for r in d.collect():
        ts = re.findall(r"[a-z0-9]+", r["text"].lower())
        if any(t in ts for t in ("vector", "hash", "join")):
            want_ids.add(r["doc_id"])
    assert {r["doc_id"] for r in got} == want_ids
    # whitespace index on the same cased corpus misses (Initcap tokens)
    create_fts_index(spark, path, "text", "doc_id", analyzer="whitespace")
    assert fts_search(spark, path, "vector hash join", k=10).count() == 0
    with pytest.raises(ValueError, match="unknown analyzer"):
        create_fts_index(spark, path, "text", "doc_id", analyzer="nope")


def test_concurrent_refresh_single_indexes_delta(spark, corpus, sf_dir,
                                                 monkeypatch):
    """Two refreshers racing on the same delta: the loser's conditional
    commit must CONFLICT and re-derive into a noop, not append the delta
    postings a second time (which would double tf/df/n_docs)."""
    import flink_connector_lance_spark.sources.fts as fts_mod

    create_fts_index(spark, corpus, "text", "doc_id")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.limit(25).select((F.col("doc_id") + 9_000_000).alias("doc_id"), "text") \
        .write.format("lance").mode("append").save(corpus)

    orig = fts_mod._commit_postings
    state = {"injected": False}

    def racy(post, idx_path, meta, mode, max_rows, **kw):
        # first commit attempt: a concurrent refresher lands FIRST,
        # inside this refresher's read->commit window
        if not state["injected"]:
            state["injected"] = True
            monkeypatch.setattr(fts_mod, "_commit_postings", orig)
            assert fts_mod.refresh_fts_index(spark, corpus, "text")["mode"] \
                == "incremental"
            monkeypatch.setattr(fts_mod, "_commit_postings", racy)
        return orig(post, idx_path, meta, mode, max_rows, **kw)

    monkeypatch.setattr(fts_mod, "_commit_postings", racy)
    out = fts_mod.refresh_fts_index(spark, corpus, "text")
    monkeypatch.setattr(fts_mod, "_commit_postings", orig)
    # the loser re-read the moved head and found the delta covered
    assert out["mode"] == "noop"
    # stats single-counted: index n_docs equals the table's row count
    info = FR.read_manifest(fts_index_path(corpus, "text")).meta["fts"]
    register_lance_datasource(spark)
    n_table = spark.read.format("lance").load(corpus).count()
    assert info["n_docs"] == n_table
    # and scores still match the full scan over the current table
    cur = spark.read.format("lance").load(corpus)
    got = _ranked_rows(fts_search(spark, corpus, QUERY, k=10))
    want = _ranked_rows(bm25_search(cur, "text", "doc_id", QUERY, k=10))
    assert got == want


def test_string_id_corpus_through_sql_route(spark, tmp_path, sf_dir):
    """A string-id corpus (URL/UUID-style ids) must index and search
    identically through BOTH the distributed fts_search and the
    in-process text_search UDTF — the SQL route used to coerce posting
    ids to int64 and crash."""
    from flink_connector_lance_spark.udtf import register_text_search

    register_lance_datasource(spark)
    path = str(tmp_path / "strdocs")
    d = load_table(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc-"), F.lpad(F.col("doc_id").cast("string"), 6, "0")
                 ).alias("url"), "text")
    d.write.format("lance").mode("overwrite").save(path)
    create_fts_index(spark, path, "text", "url")
    want = fts_search(spark, path, QUERY, k=5).collect()
    assert want and all(isinstance(r["url"], str) for r in want)
    register_text_search(spark)
    got = spark.sql(
        f"SELECT url, bm25 FROM text_search('{path}', 'text', '{QUERY}', 5)"
    ).collect()
    assert [(r["url"], r["bm25"]) for r in got] == [tuple(r) for r in want]


def test_many_term_query_bounded_plan(spark, corpus, sf_dir):
    """Past MAX_UNROLL_TERMS distinct terms, scoring flips to one
    groupBy SUM instead of a per-term column unroll: a 500-term query
    must complete with a bounded plan, and the two paths must agree on
    ids and scores (to float-summation-order tolerance)."""
    create_fts_index(spark, corpus, "text", "doc_id")
    d = load_table(spark, sf_dir, "documents")
    vocab = sorted({t for r in d.limit(40).collect()
                    for t in r["text"].split(" ") if t})
    assert len(vocab) >= 12, "fixture corpus vocabulary too small"
    q12 = " ".join(vocab[:12])

    # force the group path with a low cap; the unroll path is the truth
    grouped = fts_search(spark, corpus, q12, k=20, max_unroll_terms=4)
    plan = grouped._jdf.queryExecution().optimizedPlan().toString()
    assert "__t5" not in plan  # no per-term unrolled columns
    unrolled = fts_search(spark, corpus, q12, k=20, max_unroll_terms=1000)
    g, u = grouped.collect(), unrolled.collect()
    assert [r["doc_id"] for r in g] == [r["doc_id"] for r in u]
    for a, b in zip(g, u):
        assert a["bm25"] == pytest.approx(b["bm25"], abs=1e-6)

    # 500 distinct terms (vocab + filler that matches nothing) under the
    # DEFAULT cap: completes, still ranked, still top-k
    q500 = " ".join((vocab + [f"zz{i}notaterm" for i in range(500)])[:500])
    big = fts_search(spark, corpus, q500, k=10).collect()
    assert len(big) == 10 and all(r["bm25"] > 0 for r in big)

    # match_all survives the group path: survivors = docs containing
    # every one of the 12 terms (brute-forced from the raw texts)
    allg = fts_search(spark, corpus, q12, k=10_000, match_all=True,
                      max_unroll_terms=4).collect()
    want_ids = {r["doc_id"] for r in d.collect()
                if all(t in r["text"].split(" ") for t in q12.split(" "))}
    assert {r["doc_id"] for r in allg} == want_ids


def test_k_guards(spark, corpus):
    from flink_connector_lance_spark.sources.fts import fts_search_phrase

    create_fts_index(spark, corpus, "text", "doc_id", with_positions=True)
    with pytest.raises(ValueError, match="k must be"):
        fts_search(spark, corpus, QUERY, k=-1)
    with pytest.raises(ValueError, match="k must be"):
        fts_search_phrase(spark, corpus, "vector hash", k=-1)
    with pytest.raises(ValueError, match="phrase has"):
        fts_search_phrase(spark, corpus, " ".join(f"w{i}" for i in range(20)))


def test_udtf_rounding_matches_spark_half_up(spark):
    """F.round is HALF_UP on the double's shortest decimal repr
    (BigDecimal); the UDTF's _round_half_up6 must agree at exact
    half-ulp boundaries where numpy's half-to-even flips the digit."""
    import numpy as np

    from flink_connector_lance_spark.udtf import _round_half_up6

    vals = [0.1234565, 0.1234575, 1.0000005, 0.0000015, 0.0000025,
            2.7182818284590452, 13.9999995, 0.9999994999999999]
    got = _round_half_up6(np.array(vals, dtype=np.float64))
    want = [r["r"] for r in spark.createDataFrame(
        [(v,) for v in vals], "x double"
    ).select(F.round("x", 6).alias("r")).collect()]
    assert got.tolist() == want
    # and at least one case where half-to-even would differ
    assert np.round(np.array([0.1234565]), 6)[0] != got[0] or \
        got[0] == 0.123457


def test_auto_maintenance_reclusters_fragmented_postings(spark, corpus, sf_dir):
    from flink_connector_lance_spark.sources.auto_maintenance import (
        MaintenancePolicy,
        run_maintenance,
    )

    create_fts_index(spark, corpus, "text", "doc_id", max_rows_per_fragment=3000)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # four appends -> four incremental refreshes: the index gains AT
    # LEAST one overlapping postings fragment per refresh, so >= 5
    # fragments total REGARDLESS of how the base build's range shuffle
    # split (the old 3-append version depended on the base splitting
    # into >= 2 files, which varies with session partitioning state —
    # the full-suite flake)
    for off in (1_000_000, 2_000_000, 3_000_000, 4_000_000):
        d.limit(30).select((F.col("doc_id") + off).alias("doc_id"), "text") \
            .write.format("lance").mode("append").save(corpus)
        refresh_fts_index(spark, corpus, "text")
    idx = fts_index_path(corpus, "text")
    nfrag = len(FR.read_manifest(idx).fragments)
    assert nfrag >= 5  # >= 1 base fragment + one per refresh

    before = fts_search(spark, corpus, QUERY, k=10).collect()
    report = run_maintenance(
        spark, corpus,
        MaintenancePolicy(keep_versions=None, target_rows_per_fragment=1,
                          max_fts_fragments=4))
    st = [s for s in report["steps"] if s["step"] == "cluster_fts:text"]
    assert st and st[0]["due"]
    m_after = FR.read_manifest(idx)
    assert m_after.meta.get("fts")  # spec survived
    assert len(m_after.fragments) < nfrag  # the 4 delta runs merged away
    # the POINT of reclustering: fragments own disjoint term ranges
    # again (zone maps selective), instead of every delta overlapping
    spans = sorted((f.stats["term"]["min"], f.stats["term"]["max"])
                   for f in m_after.fragments)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert lo2 >= hi1
    after = fts_search(spark, corpus, QUERY, k=10).collect()
    assert [tuple(x) for x in before] == [tuple(x) for x in after]
    # steady state: under the default threshold a second pass is not due
    report2 = run_maintenance(
        spark, corpus,
        MaintenancePolicy(keep_versions=None, target_rows_per_fragment=1),
        dry_run=True)
    st2 = [s for s in report2["steps"] if s["step"] == "cluster_fts:text"]
    assert st2 and not st2[0]["due"]


def test_udtf_skips_stale_postings_after_delete(spark, corpus):
    """A covered-fragment rewrite before refresh: the SQL route must skip
    postings whose documents are gone, not crash."""
    from flink_connector_lance_spark.sources.maintenance import delete_rows
    from flink_connector_lance_spark.udtf import register_text_search

    create_fts_index(spark, corpus, "text", "doc_id")
    register_text_search(spark)
    pre = spark.sql(
        f"SELECT doc_id FROM text_search('{corpus}', 'text', '{QUERY}', 500)"
    ).collect()
    victim = {r["doc_id"] for r in pre[:20]}
    delete_rows(spark, corpus, f"doc_id IN ({','.join(map(str, victim))})")
    post = spark.sql(
        f"SELECT doc_id FROM text_search('{corpus}', 'text', '{QUERY}', 500)"
    ).collect()
    assert {r["doc_id"] for r in post}.isdisjoint(victim)
