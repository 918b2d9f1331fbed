"""Sequence packing: assign documents to fixed token-budget bins — the
batching primitive that turns a filtered/deduped corpus into training
sequences (the last step of an LLM data pipeline before tokenizer output).

Semantics: *sharded greedy contiguous* packing. Documents are ordered by
id within a deterministic hash shard; a running token sum assigns each
document to bin ``floor(preceding_tokens / budget)``. A document that
straddles a budget boundary belongs to the bin where it starts (real
pipelines truncate or roll the tail; the assignment is what Spark owns).
This is the standard approximation used at scale — optimal bin packing is
NP-hard and needs global state; greedy-contiguous wastes at most one
document's tokens per bin and needs only a per-shard prefix sum.

Scale shape: a GLOBAL ordered window would serialize the corpus through
one reducer — a non-starter at 100 TB. Sharding first (deterministic
md5-derived shard, so results are engine-portable and sticky) bounds each
window partition to corpus/n_shards and every shard packs in parallel;
the price is per-shard (not global) bin numbering, which training loaders
don't care about. n_shards should scale with cluster parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def shard_of(id_col, n_shards: int):
    """Deterministic engine-portable shard: first 4 md5 hex chars of the
    id (same construction as sampling.stratified_split's bucket)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 4), 16, 10).cast("int")
        % n_shards
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    tokens_col,
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Per-document packing assignment: (id, shard, bin, n_tokens).

    One shuffle (the window exchange on shard); the prefix sum and bin
    arithmetic run inside the sorted window partition."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    tok = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = Window.partitionBy("shard").orderBy(id_col)
    base = df.select(
        F.col(id_col),
        shard_of(id_col, n_shards).alias("shard"),
        tok.cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    return base.withColumn(
        "bin", F.floor((cum - F.col("n_tokens")) / budget).cast("long")
    )


def pack_stats(
    df: DataFrame,
    id_col: str,
    tokens_col,
    budget: int = 512,
    n_shards: int = 8,
) -> DataFrame:
    """Per-bin packing summary: (shard, bin, n_docs, bin_tokens,
    first_id, last_id) — the manifest a training loader consumes. The
    groupBy reuses the window's (shard) partitioning, so no second
    exchange is needed for the aggregation."""
    packed = pack_bins(df, id_col, tokens_col, budget, n_shards)
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min(id_col).alias("first_id"),
        F.max(id_col).alias("last_id"),
    )
