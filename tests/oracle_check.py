"""Local replica of the driver's Spark-vs-DuckDB comparison.

Mirrors the documented gate: row count + schema (column names) +
order-insensitive value comparison with columns sorted by name. We compare
actual values (not hashes) so failures are debuggable; queries are expected
to round floats identically on both sides, so exact equality is the target
and a tiny float tolerance only guards against platform rounding noise.
"""

from __future__ import annotations

import datetime as _dt
import math


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    return v


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def rows_sorted_by_colname(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [columns[i] for i in order], out


def _values_equal(a, b, tol=1e-9):
    if isinstance(a, float) and isinstance(b, (float, int)):
        if math.isclose(a, float(b), rel_tol=tol, abs_tol=tol):
            return True
        return False
    if isinstance(b, float) and isinstance(a, int):
        return math.isclose(float(a), b, rel_tol=tol, abs_tol=tol)
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y, tol) for x, y in zip(a, b))
    return a == b


def compare_spark_duckdb(spark_df, duck_con, sql, max_report=5):
    """Return (ok, message). Runs both sides and diffs canonicalized rows."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = [tuple(r) for r in rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"

    _, s_sorted = rows_sorted_by_colname(s_cols, s_rows)
    _, d_sorted = rows_sorted_by_colname(d_cols, d_rows)
    bad = []
    for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
        if not _values_equal(a, b):
            bad.append((i, a, b))
            if len(bad) >= max_report:
                break
    if bad:
        msg = "\n".join(f"  row {i}: spark={a} duckdb={b}" for i, a, b in bad)
        return False, f"value mismatches ({len(bad)}+ shown):\n{msg}"
    return True, f"ok ({len(s_rows)} rows)"
