"""Physical-plan shape assertions — the scale contract, not just results.

These pin the properties that matter at 100 TB: filters and projections
reach the parquet scan, small dims broadcast, ORDER BY+LIMIT compiles to
TakeOrdered (per-partition top-k), and aggregates are partial+final
(never the reference's single-task degradation)."""

from __future__ import annotations

from flink_connector_lance_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_pruned_at_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_project")
    assert "ReadSchema" in plan
    # only the 3 needed columns of lineitem's 11 reach the scan
    read_schema = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "filter_comparisons")
    # the plan string truncates the PushedFilters list; the DataFilters
    # entries prove the predicates reached the scan node
    pushed = plan[plan.index("PushedFilters"):].splitlines()[0]
    assert pushed.startswith("PushedFilters: [IsNotNull(")
    assert "DataFilters: [isnotnull(l_quantity" in plan


def test_topk_uses_take_ordered_not_global_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "topk_orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q5_dimension_chain_broadcasts_below_fact_shuffles(spark, sf_dir):
    """tpch_q5's scale contract: the supplier->nation->region chain
    (with the region predicate) joins as three broadcasts with NO
    exchange of lineitem before them, so only the region-filtered slice
    of the fact table enters the orderkey/custkey shuffles."""
    plan = _plan(spark, sf_dir, "tpch_q5_region_revenue")
    # >= 3: the dim chain always broadcasts; at tiny SFs AQE broadcasts
    # the orders/customer joins too (5 total), at scale those shuffle
    assert plan.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the tree prints parents before children: walking UP from the
    # lineitem scan, at least the three dim joins must sit between the
    # scan and the nearest shuffle Exchange above it — an exchange
    # between scan and broadcasts would mean the whole fact table was
    # shuffled before the region predicate pruned it
    li_scan = plan.index("lineitem")
    above = plan[:li_scan]
    last_ex = above.rfind("Exchange")
    assert last_ex != -1
    assert above[last_ex:].count("BroadcastHashJoin") >= 3, \
        "the broadcast dim chain must consume the raw lineitem scan"


def test_agg_is_partial_final(spark, sf_dir):
    # contra ref LanceSource.java:156-170 single-subtask degradation:
    # two HashAggregate nodes (partial + final) around the exchange
    plan = _plan(spark, sf_dir, "agg_groupby_full")
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_simhash_banding_is_equi_join(spark, sf_dir):
    # pigeonhole banding: candidates via equi-join on (chunk_idx, chunk_bits),
    # never the O(n^2) broadcast nested-loop of the all-pairs formulation
    plan = _plan(spark, sf_dir, "dedup_simhash")
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_cosine_is_bucketed_equi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_embedding_cosine")
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_is_single_shuffle_window_not_range_join(spark, sf_dir):
    # union+window formulation: one Exchange on the key + a Window/Sort —
    # never a range-predicate join (BroadcastNestedLoopJoin over time)
    plan = _plan(spark, sf_dir, "events_asof_attribution")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_range_join_is_banded_equi_join(spark, sf_dir):
    # banded buckets make the interval join an equi-join on (key, bucket)
    plan = _plan(spark, sf_dir, "events_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_knn_join_broadcasts_queries(spark, sf_dir):
    # the query set must ship to the corpus (broadcast cross of a tiny
    # side), never a shuffle of the corpus against the queries
    plan = _plan(spark, sf_dir, "knn_join_batch")
    assert "BroadcastNestedLoopJoin" in plan  # the intended tiny-side cross
    assert "SortMergeJoin" not in plan


def test_whole_stage_codegen_active(spark, sf_dir):
    # '*(n)' markers = whole-stage-codegen spans (AQE prints the final
    # formatted tree lazily, so check the codegen markers instead)
    plan = _plan(spark, sf_dir, "filter_comparisons")
    assert "*(1)" in plan


def test_pq_adc_search_is_takeordered_over_skinny_codes(spark, sf_dir):
    # ADC candidate selection: TakeOrdered over the codes relation (per-
    # partition top-R), never a global sort; the candidate fetch is a
    # semi-join, never a nested loop
    import os
    import shutil
    import tempfile

    from flink_connector_lance_spark import pq
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.queries.knn import QVEC
    from flink_connector_lance_spark.sources.writer import write_dataset

    path = os.path.join(tempfile.gettempdir(), "fcls_planshape_pq")
    if not pq.has_pq_index(path, "embedding"):
        shutil.rmtree(path, ignore_errors=True)
        e = load_table(spark, sf_dir, "embeddings")
        write_dataset(e, path, mode="overwrite")
        pq.build_pq_index(spark, path, "embedding", id_col="vec_id",
                          num_sub_vectors=8, num_bits=4, iterations=1)
    df = pq.pq_search(spark, path, "embedding", QVEC, k=10, refine_factor=10,
                      tiebreak_cols=["vec_id"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_sequences_single_window_exchange(spark, sf_dir):
    # sharded packing: the window exchange on shard is the ONLY wide
    # dependency before the per-bin aggregate (which reuses the shard
    # partitioning); a global ordered window would show a singlepartition
    # exchange
    plan = _plan(spark, sf_dir, "pack_sequences")
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_knn_join_lsh_never_broadcasts_large_sides(spark, sf_dir):
    # corpus-vs-corpus path: with Catalyst unable to assume any side is
    # small (broadcast disabled), the whole plan must be shuffled
    # equi-joins — no broadcast of either side, never a nested loop
    import pyspark.sql.functions as F

    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.ann import make_planes
    from flink_connector_lance_spark.operators.knn import knn_join_lsh

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = e.filter(F.col("vec_id") >= 50)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = knn_join_lsh(corpus, queries, "embedding", k=3,
                          planes=make_planes(num_planes=4, dim=64))
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_chunk_documents_is_zero_shuffle(spark, sf_dir):
    # chunking is a pure projection + one generator: no Exchange anywhere
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.text import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    plan = chunk_documents(d, "text", "doc_id", 32, 24) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan  # the posexplode


def test_line_dedup_never_nested_loop_and_aggregates_partial_final(spark, sf_dir):
    # doc-frequency must be a partial+final aggregate (map-side combine
    # absorbs boilerplate-line skew) and no join may degenerate to a
    # nested loop / cartesian product
    import pyspark.sql.functions as F

    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.text import line_dedup

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws("\n", "text", F.lit("boiler")).alias("t"))
    plan = line_dedup(d, "t", "doc_id", max_doc_freq=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_spread_is_noop_when_already_parallel(spark, sf_dir):
    # the guard on the repartition idiom: input already at (or above)
    # defaultParallelism partitions -> spread() must add NO exchange (at
    # 100 TB the scan yields thousands of splits and an unconditional
    # repartition would be a full-corpus shuffle AND a parallelism cut)
    from flink_connector_lance_spark.io import load_table, spread

    par = spark.sparkContext.defaultParallelism
    wide = load_table(spark, sf_dir, "documents").repartition(par, "doc_id")
    out = spread(wide, "doc_id")
    assert out is wide  # plan object untouched — no new Exchange node
    # and the under-parallelized local scan DOES get spread
    narrow = load_table(spark, sf_dir, "documents").coalesce(1)
    out2 = spread(narrow, "doc_id")
    assert out2 is not narrow
    assert out2.rdd.getNumPartitions() == par


def test_knn_per_group_one_hash_exchange_no_global_sort(spark, sf_dir):
    # per-group top-k must be ONE hash shuffle on the group key + a
    # window sort bounded by each group's size — never a range-partition
    # global sort (which at 100 TB sorts the whole corpus to answer a
    # per-category question)
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.knn import knn_per_group

    e = load_table(spark, sf_dir, "embeddings")
    plan = knn_per_group(e, "embedding", [0.0] * 8, "label", k=3,
                         tiebreak_cols=["vec_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert plan.count("hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_hybrid_rrf_fusion_joins_only_topk_legs(spark, sf_dir):
    # RRF fuses two ALREADY-truncated top-K legs: the fusion join must be
    # an equi-join over K-row relations (broadcast at scale), never a
    # nested-loop / cartesian over the corpus, and both corpus-sized legs
    # must end in TakeOrdered or a window-truncated rank before joining
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.retrieval import hybrid_search

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    plan = hybrid_search(docs, "text", "doc_id", "data pipeline", emb,
                         "embedding", "vec_id", [0.0] * 8, k=5, leg_k=10) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # exactly one nested-loop join is allowed: BM25's 1-row corpus-stats
    # aggregate broadcast-crossed into the scoring projection. Any more
    # would mean a corpus-sized relation entered a nested loop.
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    # final fused top-k is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_cap_per_key_skew_path_bounds_fan_in(spark, sf_dir):
    # two-stage cap: stage 1 windows over (key, bucket) so no task sees a
    # whole hot key; the plan must contain BOTH window exchanges and no
    # single-partition funnel
    from flink_connector_lance_spark.io import load_table
    from flink_connector_lance_spark.operators.sampling import cap_per_key

    d = load_table(spark, sf_dir, "documents")
    plan = cap_per_key(d, "source", "doc_id", cap=5, skew_buckets=4) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") >= 2
    assert "SinglePartition" not in plan
