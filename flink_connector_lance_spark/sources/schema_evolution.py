"""Schema evolution for the versioned dataset: add or drop columns on
append without rewriting history.

The native Lance format evolves schemas as a first-class commit (the
reference connector itself is static-schema: its sink writes whatever
the Flink table schema declared — ref table/LanceDynamicTableSink.java).
Here evolution is the lakehouse-standard contract:

- the authoritative table schema rides in the manifest meta (``schema``
  key, Spark StructType JSON), written by every ``write_dataset`` commit
  and inherited by maintenance commits (compaction/DELETE/MERGE/vacuum
  never change the schema);
- an APPEND whose columns differ from the table schema is refused unless
  ``DatasetOptions.schema_evolution`` is set (``write.schema-evolution``),
  mirroring Spark's own ``mergeSchema`` opt-in;
- with evolution on, new columns append to the schema (old fragments
  simply lack them — readers null-fill), columns missing from the batch
  are written as typed nulls, and TYPE changes are always refused (no
  silent widening/narrowing);
- readers resolve fragments against the manifest schema BY NAME, so a
  100 TB table evolves in O(1): no fragment is rewritten, no mergeSchema
  footer sweep over the file listing at plan time (the schema is one
  manifest read).

Time travel composes: each version's manifest carries the schema that
was current at that commit, so reading v_old shows the pre-evolution
columns.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from . import fragments as FR


def dataset_schema(path: str, version: int | None = None) -> StructType:
    """The table schema at ``version`` (default latest): the manifest's
    recorded schema when present, else derived from the first fragment's
    parquet footer (pre-evolution datasets) — metadata-only either way."""
    manifest = FR.read_manifest(path, version)
    sj = manifest.meta.get("schema")
    if sj:
        return StructType.fromJson(json.loads(sj))
    if not manifest.fragments:
        raise FileNotFoundError(
            f"dataset {path} (v{manifest.version}) has no fragments and no recorded schema"
        )
    import pyarrow.parquet as pq

    from ..types import arrow_schema_to_spark

    first = os.path.join(path, manifest.fragments[0].file)
    return arrow_schema_to_spark(pq.read_schema(first))


def align_for_append(df: DataFrame, current: StructType,
                     allow_evolution: bool) -> DataFrame:
    """Project ``df`` onto the append-compatible schema.

    Same column set -> reorder to the table's order (fragment files stay
    uniform). Different set -> refused unless ``allow_evolution``; then
    the output schema is the table's columns (batch-missing ones as typed
    nulls) followed by the batch's NEW columns. A column present on both
    sides with a different type is always an error."""
    cur = {f.name: f for f in current.fields}
    inc = {f.name: f for f in df.schema.fields}
    added = [n for n in df.schema.names if n not in cur]
    missing = [n for n in current.names if n not in inc]
    conflicts = [
        (n, str(cur[n].dataType), str(inc[n].dataType))
        for n in current.names
        if n in inc and cur[n].dataType != inc[n].dataType
    ]
    if conflicts:
        detail = ", ".join(f"{n}: table {t} vs batch {b}" for n, t, b in conflicts)
        raise ValueError(f"schema evolution cannot change column types ({detail})")
    if (added or missing) and not allow_evolution:
        raise ValueError(
            "append schema differs from table schema "
            f"(new columns: {added or 'none'}, missing columns: {missing or 'none'}); "
            "set write.schema-evolution=true (DatasetOptions.schema_evolution) to evolve"
        )
    cols = [
        F.col(n) if n in inc else F.lit(None).cast(cur[n].dataType).alias(n)
        for n in current.names
    ] + [F.col(n) for n in added]
    return df.select(*cols)
