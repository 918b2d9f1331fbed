"""SparkSession construction tuned for this engine.

Scale notes (100 TB design, tested on local[32]):

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy demotion are all free wins at cluster scale.
- ``spark.sql.shuffle.partitions`` defaults to 32 locally; on a real
  cluster this should be ~2-3x total executor cores (or left to AQE's
  coalescing with a high initial value).
- Arrow execution enabled: every pandas/arrow exchange (mapInArrow,
  applyInPandas, toPandas) is vectorized.
- Session timezone pinned to UTC so timestamp semantics are stable and
  match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # events.parquet carries TIMESTAMP(NANOS) which Spark 4 rejects by
    # default; read as raw ns longs and normalize in io.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Small-dim broadcast threshold: the TPC-H dims (region/nation/supplier)
    # are tiny at any SF; 64MB keeps customer/part broadcastable at sf<=1.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Files: pack small test files; at 100 TB the default 128MB split size
    # is right, locally we reduce scheduling overhead by packing.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # Per-file open-cost charge. Spark floors a scan's split size at this
    # value (maxSplitBytes = min(maxPartitionBytes, max(openCost,
    # totalBytes/defaultParallelism))), so the 4MB default caps a small
    # corpus at totalBytes/4MB tasks — an 11MB table scans on ~3 of 32
    # cores (measured: tpch_q1 0.53s -> 0.31s at 64KB). The knob is
    # self-deactivating at scale: once totalBytes/cores >> 4MB the floor
    # never binds, so a low value only raises SMALL-scan parallelism
    # (scale-adaptive splits, optimization guide §2/§6). Deployments on
    # object storage with many tiny files should export
    # SPARK_GRAFT_OPEN_COST=4194304 to restore the packing bias.
    "spark.sql.files.openCostInBytes": os.environ.get(
        "SPARK_GRAFT_OPEN_COST", str(64 * 1024)),
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "flink-connector-lance-spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable defaults to an externally provided session.

    The driver hands us a session in ``__spark_entry__.entry``; static conf
    (master, memory) is fixed by then, but SQL conf is still settable.
    """
    for k, v in DEFAULT_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # non-runtime conf on some builds; best-effort
    return spark
