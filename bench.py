"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_connector_lance_spark import registry as _registry
from flink_connector_lance_spark.session import get_spark

# Headline set: one per operator family — scan/filter/agg/join/window/knn/dedup.
# The first 12 are the round-1/2 set (kept stable for cross-round
# comparability); the tail was appended in round 3 as those operator
# families landed. ann_ivf_pq's first iteration builds the PQ index
# (cached per process); best-of-2 records the steady-state indexed search.
HEADLINE = [
    "tpch_q1",
    "filter_comparisons",
    "agg_groupby_full",
    "tpch_q3_topk",
    "tpch_q5_region_revenue",
    "window_latest_order",
    "events_tumbling_window",
    "flagship_category_count",
    "knn_cosine",
    "knn_l2_filtered",
    "dedup_minhash_lsh",
    "text_stats",
    "ann_ivf_pq",
    "text_pii_redact",
    "pack_sequences",
    # round-6 append: exact KNN (l2+dot) plus the hybrid-retrieval RRF
    # branch (BM25 leg + cosine leg + rank fusion) in one query — the
    # retrieval family's bench presence. Appending grows the headline
    # total vs earlier rounds by this query's cost; per-query timings
    # stay comparable.
    "knn_l2_dot",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="fcls-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = _registry.queries()
    names = [n for n in HEADLINE if n in qs]

    # Warm the JVM + parquet footer caches with a trivial action.
    qs[names[0]](spark, sf_dir).limit(1).collect()

    timings: dict[str, float] = {}
    for name in names:
        # best-of-3: early runs absorb JIT/GC/page-cache noise that has
        # nothing to do with plan quality; min is the steady-state cost.
        # Was best-of-2 through round 7 — measured on the multi-stage
        # joins (tpch_q5) that C2 compilation needs three iterations to
        # reach steady state (1.25s -> 1.2s -> 1.06s), so two runs
        # systematically over-reported them by ~15%.
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            # noop sink materializes every output column (count() would let
            # Catalyst prune the projection and under-report scan cost).
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # the round-1..5 comparable set excludes the round-6 knn_l2_dot
    # append, so rounds stay comparable on one stable number
    legacy15 = round(sum(v for n, v in timings.items() if n != "knn_l2_dot"), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "legacy15_total": legacy15,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
