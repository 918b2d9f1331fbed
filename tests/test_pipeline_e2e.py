"""End-to-end training-data pipeline: the full chain a 100 TB corpus
runs through, composed from this engine's operators in one flow —

    load -> lang-ID filter -> boilerplate line scrub -> quality filter ->
    exact dedup -> near-dup clustering + canonical-survivor resolution ->
    benchmark decontamination -> per-source cap ->
    train/val/test split + mixture -> sequence packing (+ a chunking
    branch for embedding/RAG prep) -> versioned dataset write + readback

Each stage's row accounting is asserted against independently computed
expectations, so a stage that silently drops or duplicates rows fails
here even though every operator also has its own unit/oracle coverage.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_connector_lance_spark.io import load_table
from flink_connector_lance_spark.operators import dedup as D
from flink_connector_lance_spark.operators import packing as P
from flink_connector_lance_spark.operators import sampling as S
from flink_connector_lance_spark.operators import text as T
from flink_connector_lance_spark.sources.reader import read_dataset
from flink_connector_lance_spark.sources.writer import write_dataset


def test_full_training_pipeline_row_accounting(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    n0 = d.count()

    # 1. language filter: keep docs whose n-gram lang-ID is en/de/fr
    langs = ("en", "de", "fr")
    with_lang = d.withColumn("lid", T.lang_id("text"))
    kept_lang = with_lang.filter(F.col("lid").isin(*langs)).drop("lid")
    n1 = kept_lang.count()
    assert 0 < n1 <= n0

    # 1b. boilerplate line scrub: every doc carries a synthetic shared
    # footer; corpus-level line dedup must strip it from ALL docs while
    # keeping the row count intact (row-preserving transform)
    with_boiler = kept_lang.withColumn(
        "text", F.concat_ws("\n", "text", F.lit("all rights reserved")))
    scrubbed = T.line_dedup(with_boiler, "text", "doc_id", max_doc_freq=2)
    assert scrubbed.count() == n1
    assert scrubbed.filter(F.col("n_kept_lines") >= F.col("n_lines")).count() == 0
    kept_lang = (kept_lang.drop("text")
                 .join(scrubbed.select("doc_id", F.col("cleaned").alias("text")),
                       on="doc_id"))
    assert kept_lang.filter(F.col("text").contains("all rights reserved")).count() == 0

    # 2. quality filter: drop the low-quality tail
    scored = kept_lang.withColumn("q", T.quality_score("text"))
    kept_q = scored.filter(F.col("q") >= 0.2)
    n2 = kept_q.count()
    assert 0 < n2 <= n1

    # 3. exact dedup (keep-lowest-id) over a corpus with planted copies
    planted = kept_q.limit(5).withColumn("doc_id", F.col("doc_id") + 5_000_000)
    corpus = kept_q.unionByName(planted)
    keep_ids = D.exact_dedup(corpus, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id"))
    deduped = corpus.join(keep_ids, on="doc_id", how="left_semi")
    n3 = deduped.count()
    assert n3 == n2  # the 5 planted copies resolve to their originals

    # 4. near-dup clustering + canonical survivor (quality argmax)
    pairs = D.minhash_lsh_pairs(deduped, "text", "doc_id", 16, 4)
    comp = D.connected_components(deduped.select("doc_id"), pairs, id_col="doc_id")
    resolved = D.resolve_duplicates(deduped, comp, id_col="doc_id",
                                    quality_col="q")
    survivors = resolved.filter(F.col("keep")).drop("component", "keep")
    n4 = survivors.count()
    n_clusters = comp.select("component").distinct().count()
    assert n4 == n_clusters  # exactly one survivor per duplicate cluster
    assert 0 < n4 <= n3

    # 5. decontamination against an eval set (truncated doc prefixes)
    ev = survivors.filter(F.col("doc_id") % 31 == 0).select(
        "doc_id",
        F.array_join(F.slice(T.tokens("text"), 1, 25), " ").alias("text"))
    clean = D.decontaminate(survivors, ev, "text", "doc_id", threshold=0.5)
    n5 = clean.count()
    # every eval item was extracted from a surviving doc, so its source is
    # contaminated by construction: decontamination must drop something
    assert 0 < n5 < n4

    # 5b. per-source cap: no source may dominate the cleaned corpus
    cap = 20
    capped = S.cap_per_key(clean, "source", "doc_id", cap=cap, skew_buckets=4)
    n5b = capped.count()
    assert 0 < n5b <= n5
    assert capped.groupBy("source").count().agg(F.max("count")).first()[0] <= cap
    clean, n5 = capped, n5b

    # 6. split + mixture: disjoint covering split, then weighted sampling
    split = S.stratified_split(clean, "doc_id")
    by_split = dict(split.groupBy("split").count().collect())
    assert sum(by_split.values()) == n5
    mixed = S.sample_mixture(split.filter(F.col("split") == "train"),
                             "doc_id", {"en": 1.0, "de": 0.5}, key_col="lang")
    n_train = by_split.get("train", 0)
    n6 = mixed.count()
    assert n6 <= n_train

    # 7. sequence packing: every doc lands in exactly one bin
    toks = mixed.select("doc_id", T.token_count("text").alias("n_tok"))
    bins = P.pack_stats(toks, "doc_id", "n_tok", budget=512, n_shards=8)
    assert bins.agg(F.sum("n_docs")).first()[0] == n6

    # 7b. chunking branch (embedding/RAG prep off the same corpus): every
    # training doc yields at least one chunk, none is orphaned or lost
    chunks = T.chunk_documents(mixed, "text", "doc_id", chunk_tokens=32, stride=24)
    assert chunks.select("doc_id").distinct().count() == n6
    assert chunks.groupBy("doc_id").count().agg(F.min("count")).first()[0] >= 1

    # 8. materialize as a versioned dataset and read back losslessly
    path = str(tmp_path / "corpus")
    write_dataset(mixed.drop("q"), path, mode="overwrite")
    back = read_dataset(spark, path)
    assert back.count() == n6
    assert sorted(back.columns) == sorted(c for c in mixed.columns if c != "q")
