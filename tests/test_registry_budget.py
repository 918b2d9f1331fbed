"""The external correctness driver records at most DRIVER_QUERY_CAP queries
(in registration order) — round 1 proved this by dropping the two queries
registered past slot 50. Pin the budget so every registered operator keeps
a correctness row."""

from __future__ import annotations

from flink_connector_lance_spark.registry import DRIVER_QUERY_CAP, REGISTRY, _ensure_loaded

_ensure_loaded()


def test_registry_within_driver_cap():
    assert len(REGISTRY) <= DRIVER_QUERY_CAP, (
        f"{len(REGISTRY)} registered queries exceed the driver's "
        f"{DRIVER_QUERY_CAP}-query cap; queries past the cap get no "
        "correctness evidence — merge or retire queries instead"
    )


def test_every_query_has_oracle_or_documented_exception():
    no_oracle = [n for n, s in REGISTRY.items() if s.oracle is None]
    # non-SQL-expressible ops may omit the oracle (weaker rows-only check);
    # keep this list explicit so additions are deliberate
    assert no_oracle == [], f"queries without oracle SQL: {no_oracle}"
