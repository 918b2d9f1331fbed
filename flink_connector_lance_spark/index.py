"""ANN index builder (ref LanceIndexBuilder.java).

Wraps ``lance.dataset(...).create_index`` for IVF_PQ / IVF_HNSW_PQ /
IVF_FLAT with the reference's parameter surface and validation
(ref :125-179, defaults ref config/LanceOptions.java:123-190), returning
an ``IndexBuildResult{success, duration, error}`` (ref :380-435).

The native library is import-gated; without it, ``build_index`` validates
everything and then reports a failed result naming the missing dependency
(parameter validation itself is fully testable).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from .options import DatasetOptions, DistanceMetric, IndexType
from .sources import fragments as FR


@dataclass
class IndexBuildResult:
    """ref LanceIndexBuilder.java:380-435."""

    success: bool
    duration_seconds: float
    error: str | None = None
    index_type: IndexType | None = None
    column: str | None = None


def validate_index_params(opts: DatasetOptions, column: str, schema_names: list[str]) -> None:
    """Column existence (ref LanceIndexBuilder.java:210-218) on top of the
    option-range validation done by DatasetOptions."""
    if column not in schema_names:
        raise ValueError(f"index column {column!r} not in dataset schema {schema_names}")


def build_index(
    path: str,
    column: str,
    index_type: "str | IndexType" = IndexType.IVF_PQ,
    metric: "str | DistanceMetric" = DistanceMetric.L2,
    replace: bool = False,
    options: DatasetOptions | None = None,
) -> IndexBuildResult:
    opts = options or DatasetOptions(path=path)
    itype = IndexType.parse(index_type)
    metric = DistanceMetric.parse(metric)
    start = time.perf_counter()
    try:
        if not FR.HAVE_LANCE:
            raise FR.LanceUnavailableError("ANN index building")
        import lance  # pragma: no cover - native path

        ds = lance.dataset(path)  # pragma: no cover
        validate_index_params(opts, column, ds.schema.names)  # pragma: no cover
        kwargs = {  # pragma: no cover
            "num_partitions": opts.index_num_partitions,
            "replace": replace,
            "metric": metric.value,
        }
        if itype in (IndexType.IVF_PQ, IndexType.IVF_HNSW_PQ):  # pragma: no cover
            kwargs["num_sub_vectors"] = opts.index_num_sub_vectors or 16
            kwargs["num_bits"] = opts.index_num_bits
        if itype is IndexType.IVF_HNSW_PQ:  # pragma: no cover
            kwargs["m"] = opts.index_m
            kwargs["ef_construction"] = opts.index_ef_construction
        ds.create_index(  # pragma: no cover
            column, index_type=itype.value.upper(), **kwargs
        )
        return IndexBuildResult(  # pragma: no cover
            True, time.perf_counter() - start, None, itype, column
        )
    except Exception as e:  # noqa: BLE001 - result object carries the error (ref :380-435)
        return IndexBuildResult(False, time.perf_counter() - start, str(e), itype, column)
