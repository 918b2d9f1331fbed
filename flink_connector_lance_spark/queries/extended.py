"""Extended surface: aggregate fast paths, beyond-reference OLAP shapes,
regex tokenization.

- count-star metadata fast path: the reference reads fragment row counts
  without scanning data (ref LanceInputFormat.java:117); our manifest
  carries per-fragment row counts, so COUNT(*) is a driver-side
  metadata sum — at 100 TB this answers in milliseconds vs a full scan.
- grouping sets / rollup: the reference REJECTS multiple grouping sets
  (ref table/LanceDynamicTableSource.java:406-408); Spark executes them
  natively engine-side — a strict capability superset.
- BPE-ish regex tokenization: token counting on a regex alphabet rather
  than whitespace (training-data pipeline op).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register


@register(
    "source_count_star_fast",
    oracle="SELECT count(*) AS cnt FROM documents",
    doc="COUNT(*) from fragment metadata — no data scan (manifest row "
        "counts; ref fragment.countRows analog LanceInputFormat.java:117).",
)
def source_count_star_fast(spark, sf_dir):
    import os
    import shutil
    import tempfile

    from ..sources.reader import count_rows
    from ..sources.writer import write_dataset

    d = load_table(spark, sf_dir, "documents")
    sf = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(tempfile.gettempdir(), "fcls_datasets", f"cntfast-{sf}-{os.getpid()}")
    shutil.rmtree(path, ignore_errors=True)
    write_dataset(d, path, mode="overwrite")
    n = count_rows(path)  # metadata-only: manifest sum, zero data IO
    return spark.createDataFrame([(n,)], "cnt bigint")


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS cnt,
           round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets — beyond the reference, which rejects >1 "
        "grouping set (ref table/LanceDynamicTableSource.java:406-408); "
        "Spark expands grouping sets inside the partial aggregate.",
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


@register(
    "agg_cube_approx_distinct",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact COUNT DISTINCT per group (ref AggregateExecutor HashSet "
        "path :115-123). The 100 TB variant approx_count_distinct(HLL) is "
        "asserted separately in tests (not hash-comparable by design).",
)
def agg_cube_approx_distinct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )


@register(
    "text_tokens_regex",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS INT)
               AS n_unique
    FROM documents
    """,
    doc="BPE-ish regex tokenization: alphabet-run tokens + vocabulary size "
        "per document.",
)
def text_tokens_regex(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit("[a-z0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
    )
