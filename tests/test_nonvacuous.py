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
