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
    # (spark.sql.files.openCostInBytes deliberately stays at the Spark
    # default: an interleaved A/B at sf0.1 showed no effect — every corpus
    # file is a single parquet row group, so split count never changes
    # effective scan parallelism here — and lowering it would bias
    # many-small-fragment scans toward under-packing at scale.)
    # InferFiltersFromGenerate synthesizes `size(e)>0 AND e IS NOT NULL`
    # under every explode(e) and PushDownPredicates then sinks it below
    # exchanges — so a generator over a COMPUTED array (shingles, bands,
    # chunk windows: every generate in this engine) re-evaluates the whole
    # array expression a second time, on the scan side of the shuffle,
    # serializing the corpus's heaviest CPU into the scan stage. Measured
    # on the shingle explode: 5.8s -> 0.34s at sf0.1 with the rule off
    # (identical output). The rule only ever pays off for STORED array
    # columns, where the inferred filter can prune at the source; the
    # engine generates exclusively from derived arrays.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
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
