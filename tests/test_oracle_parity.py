"""Run every registered query against its DuckDB oracle — the local replica
of the driver's CORRECTNESS gate. Queries without an oracle get a weaker
runs-and-returns-rows check (matching the driver's rows-only fallback)."""

from __future__ import annotations

import pytest

from flink_connector_lance_spark.registry import REGISTRY, _ensure_loaded

from .oracle_check import compare_spark_duckdb

_ensure_loaded()
ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_parity(name, spark, duck, sf_dir):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = df.limit(10).collect()
        assert df.schema is not None
        assert rows is not None
        return
    ok, msg = compare_spark_duckdb(df, duck, spec.oracle)
    assert ok, f"{name}: {msg}"
