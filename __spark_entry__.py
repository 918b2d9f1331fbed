"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's own demo shape:
category counts ordered by count DESC — ref table/FlinkSqlDemo.java:441-450)
on sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via the package registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_connector_lance_spark import registry as _registry  # noqa: E402
from flink_connector_lance_spark.session import tune_existing  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_existing(spark)
    fn = _registry.queries()["flagship_category_count"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = _registry.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only check)."""
    return _registry.oracle_sql()
