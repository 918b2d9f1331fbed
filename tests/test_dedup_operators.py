"""Unit tests for dedup operator internals: pigeonhole-banding losslessness
and the hot-shingle skew guard."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_connector_lance_spark.operators import dedup as D


def test_simhash_banding_equals_all_pairs(spark):
    """Banding must be lossless: same pairs as the brute-force definition."""
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta token{i % 7} token{i % 3}") for i in range(40)],
        ["doc_id", "text"],
    )
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_pairs(docs, "text", "doc_id", bits=32, max_hamming=6).collect()
    }
    # brute-force reference on the signature relation
    hs = docs.select(
        "doc_id",
        F.transform(F.split("text", " "), lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")).alias("hs"),
    )
    from flink_connector_lance_spark.operators.text import simhash_of

    sig = hs.select("doc_id", simhash_of(F.col("hs"), 32).alias("sig"))
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r.id_a, r.id_b, r.hamming)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
        .collect()
    }
    assert banded == brute
    assert len(brute) > 0  # non-vacuous: the corpus must produce near-dups


def test_hot_shingle_guard_prunes_pathological_shingle(spark):
    """A shingle shared by every doc must not reach the self-join when the
    DF cap is set: without the guard the join on that key is O(n^2)."""
    common = "the quick brown"  # one 3-gram shared by ALL docs
    docs = spark.createDataFrame(
        [(i, f"the quick brown unique{i} word{i} tail{i} end{i}") for i in range(50)],
        ["doc_id", "text"],
    )
    unguarded = D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_k=3, threshold=0.0)
    guarded = D.ngram_jaccard_pairs(
        docs, "text", "doc_id", shingle_k=3, threshold=0.0, max_doc_freq=10
    )
    # unguarded: every pair collides on the hot shingle -> 50*49/2 pairs
    assert unguarded.count() == 50 * 49 // 2
    # guarded: the only shared shingle is pruned -> no candidate pairs at all
    assert guarded.count() == 0
    del common


def test_hot_shingle_guard_keeps_legit_overlap(spark):
    """The guard must only drop shingles above the cap — real overlapping
    pairs below the cap survive with their Jaccard intact."""
    docs = spark.createDataFrame(
        [
            (1, "shared prefix here plus alpha beta gamma"),
            (2, "shared prefix here plus delta epsilon zeta"),
            (3, "completely different words in this one doc"),
        ],
        ["doc_id", "text"],
    )
    out = D.ngram_jaccard_pairs(docs, "text", "doc_id", shingle_k=3, threshold=0.1,
                                max_doc_freq=10).collect()
    pairs = {(r.id_a, r.id_b) for r in out}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_connected_components_labels_clusters(spark):
    import pyspark.sql.functions as F

    vertices = spark.range(10).select(F.col("id"))
    # components: {0,1,2,3} (chain), {5,6} — 4,7,8,9 singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 6)], ["id_a", "id_b"]
    )
    out = {r.id: r.component for r in
           D.connected_components(vertices, pairs, id_col="id").collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_connected_components_deep_chain_converges(spark):
    import pyspark.sql.functions as F

    n = 12
    vertices = spark.range(n).select(F.col("id"))
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"])
    out = {r.id: r.component for r in
           D.connected_components(vertices, pairs, id_col="id", max_iterations=30).collect()}
    assert all(c == 0 for c in out.values())
