"""Guard against vacuous parity passes: queries whose interesting output is
a candidate/pair/top-k set must actually produce rows on the test corpus."""

from __future__ import annotations

import pytest

from flink_connector_lance_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()

MUST_PRODUCE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "knn_l2_dot",
    "knn_cosine",
    "knn_l2_filtered",
    "ann_lsh",
    "ann_ivf_coarse",
    "text_stats",
    "multimodal_metadata_features",
    "ann_ivf_pq",
    "text_pii_redact",
]


@pytest.mark.parametrize("name", MUST_PRODUCE)
def test_produces_rows(name, spark, sf_dir):
    assert REGISTRY[name].fn(spark, sf_dir).limit(1).count() > 0, f"{name} returned 0 rows"


# Merged queries carry multiple tagged branches; the query staying
# non-empty doesn't prove every branch contributes. Pin per-branch
# non-vacuity so a branch can't silently go empty.
TAGGED_BRANCHES = {
    "dedup_exact": ("kind", {"dedup", "vocab"}),
    "dedup_ngram_jaccard": ("kind", {"pair", "contam", "decon_kept"}),
    "knn_join_batch": ("kind", {"exact", "lsh", "per_label"}),
    "vector_search_udtf": ("kind", {"vec", "text", "phrase"}),
    "train_split_stratified": ("kind", {"split", "mixture", "cap", "shuffle"}),
    "knn_l2_dot": ("metric", {"l2", "dot", "rrf"}),
    "ann_ivf_pq": ("branch", {"adc_refine", "hnsw"}),
    # the gapfill branch needs empty hourly buckets to fill; the sparse
    # sf0.001/sf0.01 event streams have them (the dense sf0.1 does not)
    "events_tumbling_window": ("kind", {"agg", "gapfill"}),
    "source_version_travel": (
        "stage",
        {"v0", "v1", "v1_meta", "compacted", "deleted", "merged", "vacuumed"},
    ),
    # the bloom-consulted point-lookup branch must contribute its row,
    # and the round-12/13 codec stages theirs (FSST arm; recursive
    # repdef + integrity-digest arm)
    "source_format_api": ("lang", {"__point_lookup__", "__native_fsst__",
                                   "__native_deep__"}),
    # the inverted-index (pre-transform) rollup summary row
    "source_roundtrip_agg": ("lang", {"__vocab__"}),
}


@pytest.mark.parametrize("name", sorted(TAGGED_BRANCHES))
def test_every_tagged_branch_produces_rows(name, spark, sf_dir):
    col, expected = TAGGED_BRANCHES[name]
    got = {
        r[col]
        for r in REGISTRY[name].fn(spark, sf_dir).select(col).distinct().collect()
    }
    assert expected <= got, f"{name}: missing branches {expected - got}"


def test_text_hygiene_branches_are_nonvacuous(spark, sf_dir):
    """text_langid_fingerprint carries column-branches, not kind-branches:
    the line-dedup columns must show lines actually removed AND actually
    kept, and the chunking columns must show real multi-chunk splits —
    otherwise the merged query passes parity while testing nothing."""
    import pyspark.sql.functions as F

    agg = REGISTRY["text_langid_fingerprint"].fn(spark, sf_dir).agg(
        F.max(F.col("n_lines") - F.col("n_kept_lines")).alias("max_removed"),
        F.min("n_kept_lines").alias("min_kept"),
        F.max("n_chunks").alias("max_chunks"),
    ).collect()[0]
    assert agg["max_removed"] > 0, "no boilerplate line was ever removed"
    assert agg["min_kept"] > 0, "a document lost ALL lines (unique ref line should survive)"
    assert agg["max_chunks"] > 1, "no document produced more than one chunk"
