"""Test-corpus table loading.

The driver's synthetic tables (TESTDATA.md) are one parquet file per table
under ``/root/testdata/sf*/``. ``load_tables`` reads them as DataFrames and
registers temp views so the delegated-SQL surface (SURVEY.md §2.6) runs
through ``spark.sql``.

Scale note: ``spark.read.parquet`` gives us columnar scans with predicate
pushdown + column pruning from Catalyst; at 100 TB these would be
directory-partitioned datasets and everything here still applies.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from . import TABLE_NAMES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Schema-inference memo: spark.read.parquet() pays a driver-side footer
# sample (~100ms/call measured) on EVERY call; queries call load_table up
# to 6 times, so inference alone cost ~2s of the 16-query bench. The memo
# caches the inferred StructType keyed on (path, mtime_ns, size) — pure
# FILE METADATA, never rows: every action still scans the parquet bytes,
# and any rewrite of the file changes the key. (The ts-as-long shape the
# key'd schema captures depends on the nanosAsLong conf, which load_table
# pins to true before inferring.)
_SCHEMA_CACHE: dict = {}
# Bounded: the engine's run shapes touch a few dozen distinct relations,
# but a long-lived session over rotating temp datasets must not grow the
# memo without limit (each entry is a StructType — small, but unbounded
# is unbounded). FIFO eviction is enough: keys are content-addressed
# (path + stat), so evicting a live entry only costs one re-inference.
_SCHEMA_CACHE_MAX = 256


def _schema_cache_key(path: str) -> tuple:
    st = os.stat(path)
    if not os.path.isdir(path):
        return (path, st.st_mtime_ns, st.st_size)
    # directory table: the dir's own stat misses an in-place rewrite of a
    # part file (same name/set keeps dir mtime+size) — fold every part
    # file's (name, mtime_ns, size) into the key instead
    import glob

    parts = tuple(
        (f, s.st_mtime_ns, s.st_size)
        for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                                  recursive=True))
        for s in (os.stat(f),)
    )
    return (path, parts)


def _cached_schema(spark: SparkSession, path: str):
    key = _schema_cache_key(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        if len(_SCHEMA_CACHE) >= _SCHEMA_CACHE_MAX:
            _SCHEMA_CACHE.pop(next(iter(_SCHEMA_CACHE)))
        _SCHEMA_CACHE[key] = schema
    return schema


def _normalize(df: DataFrame) -> DataFrame:
    """Normalize physical quirks of the corpus to engine types.

    The corpus's physical timestamp encoding has varied across driver
    regenerations — TIMESTAMP(NANOS) (surfaced as a ns epoch LongType via
    ``spark.sql.legacy.parquet.nanosAsLong``) and tz-naive ``timestamp[us]``
    (surfaced as TIMESTAMP_NTZ by Spark 4's inference) have both appeared.
    Normalize either to a µs TimestampType: the session timezone is pinned
    UTC, so the NTZ→TZ cast is value-preserving and matches DuckDB's naive
    ``ts::TIMESTAMP`` semantics.
    """
    from pyspark.sql.types import LongType, TimestampNTZType

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            # integer division — float division of ~1e18 ns loses µs precision
            # (double mantissa is 53 bits), which skews µs-level arithmetic
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = table_path(sf_dir, name)
    return _normalize(spark.read.schema(_cached_schema(spark, path)).parquet(path))


def read_parquet_memo(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet with the schema served from the metadata memo
    (see _cached_schema) — for engine-internal relations (index codes,
    graphs, centroids) that are re-read on every search: skips the
    ~100ms/driver-call footer inference; any rewrite changes the
    (path, mtime, size) key and re-infers."""
    return spark.read.schema(_cached_schema(spark, path)).parquet(path)


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from the parquet footers — the corpus twin of the
    engine's manifest COUNT(*) fast path (sources/reader.py). Queries
    that only need n to SIZE something (LSH plane count, k-means k) read
    the stored footer statistic instead of running a count job. Handles
    both a single-file table (the driver's corpus) and a Spark-written
    directory of part files (e.g. the scale-stress corpus)."""
    import glob

    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    if os.path.isdir(path):
        # recursive: a hive-partitioned layout nests part files under
        # key=value dirs — a top-level-only glob would silently return 0
        # (downstream that mis-sizes LSH planes / k-means k)
        files = glob.glob(os.path.join(path, "**", "*.parquet"),
                          recursive=True)
        if not files:
            raise FileNotFoundError(
                f"no parquet part files under directory table {path}")
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    return pq.ParquetFile(path).metadata.num_rows


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Spread CPU-dense per-row work across all cores — but ONLY when the
    scan under-parallelized.

    Locally the corpus is one parquet file, so a signature/regex-heavy
    query runs on a single partition unless we exchange first — a measured
    win. At 100 TB the scan already yields thousands of splits and an
    unconditional ``repartition(defaultParallelism, ...)`` would be a
    full-corpus exchange AND a parallelism *reduction* before map-only
    stages that need no shuffle at all. So: repartition only when the
    input has fewer partitions than ``defaultParallelism``; otherwise the
    plan is returned untouched (no Exchange — pinned by
    tests/test_plan_shape.py)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, *key_cols)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                register_views: bool = True) -> dict[str, DataFrame]:
    """Load all corpus tables; optionally register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
