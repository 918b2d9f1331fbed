"""Deterministic hash-based dataset splitting (train/val/test).

Beyond-reference operator (SURVEY.md §7.1 M10): every large-scale
training-data pipeline needs a reproducible, engine-independent split.
Random sampling (``df.sample``) is neither stable across runs nor
reproducible outside Spark; hashing the row id is both.

The bucket is the first 16 bits of ``md5(id || ':' || salt)`` modulo the
total weight — md5 of a UTF-8 string is identical in every engine
(Spark, DuckDB, Python), so the assignment is portable and the split can
be re-derived by any downstream system. A salt change re-deals the whole
split; ids are otherwise sticky (adding documents never moves existing
ones between splits).

Scale: pure codegen projection — no shuffle, no state, trivially
parallel at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def hash_bucket(id_col: str | Column, n_buckets: int, salt: str = "split") -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(id || ':' || salt).

    48 hash bits (12 hex chars), so the modulo bias is ~n_buckets/2^48 —
    immaterial at any realistic resolution. (16 bits would inflate a 0.5
    keep rate to 53.4% at resolution 10000, and any resolution beyond
    65536 would degenerate to keep-everything.)"""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if n_buckets > 1 << 32:
        raise ValueError("n_buckets beyond 2^32 is not supported")
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    hex48 = F.substring(F.md5(F.concat(col.cast("string"), F.lit(":" + salt))), 1, 12)
    return (F.conv(hex48, 16, 10).cast("long") % n_buckets).alias("bucket")


def stratified_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, int]] = (("train", 8), ("val", 1), ("test", 1)),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign each row a split label with weights ``splits`` (integer
    proportions), deterministically by ``hash_bucket(id_col)``.

    "Stratified" in the fingerprint sense: because the hash is uniform and
    independent of every feature column, each stratum of the data (language,
    source, label, ...) receives the same expected proportions without a
    per-stratum pass — verify with a groupBy(stratum, split) count.
    """
    weights = [w for _, w in splits]
    if any(w <= 0 for w in weights):
        raise ValueError("split weights must be positive")
    total = sum(weights)
    b = hash_bucket(id_col, total, salt)
    expr: Column | None = None
    lo = 0
    for name, w in splits:
        cond = b < F.lit(lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn(split_col, expr)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
    skew_buckets: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen deterministically — the
    per-domain / per-source cap every crawl-scale pipeline applies so one
    hot domain can't dominate the training mixture.

    Selection order is a global deterministic priority
    ``md5(id || ':' || salt)`` (ties broken by id), so the surviving set
    is stable across runs, engines, and appends of NEW higher-priority
    rows only — and re-derivable by any downstream system (same md5
    contract as stratified_split).

    Scale: the naive shape is one window (rank over key, keep <= cap),
    which funnels EVERY row of a hot key through one task — the exact
    skew this operator exists to fight. ``skew_buckets=B`` runs the
    two-stage equivalent: stage 1 ranks within (key, id-hash bucket) and
    keeps ``cap`` per bucket (each task sees at most 1/B of a hot key),
    stage 2 ranks the surviving <= B*cap rows per key. The result is
    IDENTICAL to the one-stage rank: the global top-``cap`` by priority
    is contained in the union of per-bucket top-``cap``s."""
    from pyspark.sql import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    pri = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    out = df.withColumn("__pri", pri)
    if skew_buckets is not None:
        if skew_buckets <= 0:
            raise ValueError("skew_buckets must be positive")
        out = out.withColumn("__b", hash_bucket(id_col, skew_buckets, salt + "b"))
        w1 = Window.partitionBy(key_col, "__b").orderBy("__pri", id_col)
        out = (
            out.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= cap)
            .drop("__rn", "__b")
        )
    w = Window.partitionBy(key_col).orderBy("__pri", id_col)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn", "__pri")
    )


def sample_mixture(
    df: DataFrame,
    id_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "mix",
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic per-key downsampling — the data-MIXING knob of a
    training pipeline ("50% of web, 100% of books, 10% of everything
    else"): keep a row iff its md5 bucket (of ``resolution`` buckets)
    falls below ``rate(key) * resolution``.

    Same portability contract as stratified_split: the md5 bucket is
    identical in every engine, membership is sticky under appends (new
    rows never flip existing rows), and changing ``salt`` re-deals the
    sample. Pure codegen projection + filter — zero shuffle, the filter
    pushes below any downstream aggregation. Keys absent from ``rates``
    keep ``default_rate``; a key's expected kept fraction is exact to
    1/resolution."""
    for kk, r in {**rates, "__default__": default_rate}.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {kk!r} must be in [0, 1], got {r}")
    if resolution <= 0:
        raise ValueError("resolution must be positive")
    b = hash_bucket(id_col, resolution, salt)
    key = F.col(key_col)
    thresh: Column | None = None
    for kk, r in rates.items():
        cond = key == F.lit(kk)
        t = F.lit(int(round(r * resolution)))
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    default_t = F.lit(int(round(default_rate * resolution)))
    thresh = default_t if thresh is None else thresh.otherwise(default_t)
    return df.filter(b < thresh)


def shuffle_order(df: DataFrame, id_col: str, num_shards: int,
                  salt: str = "shuffle") -> DataFrame:
    """Deterministic global training-order shuffle: adds ``shard`` (md5
    bucket in [0, num_shards)) and ``pos`` (the md5 hex digest — the
    within-shard sort key) to every row.

    The training-export primitive: a reproducible, engine-portable
    permutation of the corpus that needs NO global sort — writing shards
    is ``repartition(num_shards, "shard").sortWithinPartitions("pos")``,
    one hash exchange + per-task sorts, never a single-reducer orderBy.
    The permutation is a pure function of (id, salt): re-running on the
    same corpus reproduces it exactly (data-loader resumability), a salt
    change re-deals a fresh epoch order, and appended rows interleave
    into positions without moving existing ones (sticky).
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    col = F.col(id_col).cast("string")
    pos = F.md5(F.concat(col, F.lit(":" + salt)))
    return df.withColumn("pos", pos).withColumn(
        "shard", (F.conv(F.substring(F.col("pos"), 1, 12), 16, 10)
                  .cast("long") % num_shards).cast("int"))


def export_training_shards(df: DataFrame, id_col: str, path: str,
                           num_shards: int, salt: str = "shuffle") -> None:
    """Materialize the deterministic shuffle as ``num_shards`` parquet
    shard directories (``shard=N/``), each internally ordered by ``pos``
    — the layout a training data-loader streams directly. One hash
    exchange; within-task sorts only."""
    out = shuffle_order(df, id_col, num_shards, salt)
    (
        out.repartition(num_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
