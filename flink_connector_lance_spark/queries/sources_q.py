"""Source-layer queries: put the fragment dataset read/write path itself
under the correctness gate. Each query materializes a versioned dataset
from a corpus table, reads it back through ``read_dataset``, and the
oracle runs the equivalent SQL on the original table — so any loss or
duplication in the write->commit->read cycle breaks the hash match.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F

from ..io import load_table
from ..registry import register
from ..sources.reader import read_dataset
from ..sources.writer import write_dataset


def _workdir(tag: str, sf_dir: str) -> str:
    sf = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(tempfile.gettempdir(), "fcls_datasets", f"{tag}-{sf}-{os.getpid()}")
    shutil.rmtree(root, ignore_errors=True)
    return root


@register(
    "source_roundtrip_agg",
    oracle="""
    SELECT lang, source, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang, source
    """,
    doc="Write documents into a versioned fragment dataset (executor "
        "fragment files + driver commit), read back, aggregate — lossless "
        "write->commit->read under the hash gate (sources/writer.py, "
        "sources/reader.py; ref LanceSink.java:133-199 / LanceSource.java).",
)
def source_roundtrip_agg(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    path = _workdir("roundtrip", sf_dir)
    write_dataset(d, path, mode="overwrite")
    return (
        read_dataset(spark, path)
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "source_version_travel",
    oracle="""
    SELECT 'v0' AS version, count(*) AS cnt FROM documents
    UNION ALL
    SELECT 'v1' AS version,
           (SELECT count(*) FROM documents)
           + (SELECT count(*) FROM documents WHERE lang = 'en') AS cnt
    UNION ALL
    SELECT 'v1_meta' AS version,
           (SELECT count(*) FROM documents)
           + (SELECT count(*) FROM documents WHERE lang = 'en') AS cnt
    """,
    doc="MVCC version travel: overwrite-commit v0, append-commit v1, read "
        "both pinned versions (sources/fragments.py manifest versions; "
        "ref FragmentOperation.Append/Overwrite, LanceSink.java:163-189). "
        "The v1_meta row is COUNT(*) from fragment metadata only — the "
        "manifest row-count sum, zero data IO (ref fragment.countRows "
        "analog, LanceInputFormat.java:117) — and must agree with the "
        "scan count of the same version.",
)
def source_version_travel(spark, sf_dir):
    from ..sources.reader import count_rows

    d = load_table(spark, sf_dir, "documents")
    path = _workdir("versions", sf_dir)
    write_dataset(d, path, mode="overwrite")
    write_dataset(d.filter(F.col("lang") == "en"), path, mode="append")
    v0 = read_dataset(spark, path, version=0).agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("v0").alias("version"), "cnt"
    )
    v1 = read_dataset(spark, path, version=1).agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("v1").alias("version"), "cnt"
    )
    meta = spark.createDataFrame([("v1_meta", count_rows(path))], "version string, cnt bigint")
    return v0.unionAll(v1).unionAll(meta)


@register(
    "source_format_api",
    oracle="""
    SELECT lang, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents WHERE n_chars > 150
    GROUP BY lang
    """,
    doc="spark.read.format('lance') / df.write.format('lance') — the "
        "registered PySpark DataSource (sources/datasource.py; ref "
        "table/LanceDynamicTableFactory.java:52-237 + SPI registration): "
        "format write (per-task Arrow fragment + driver manifest commit), "
        "format read (one partition per fragment) with the n_chars "
        "predicate pushed through pushFilters into the fragment scan.",
)
def source_format_api(spark, sf_dir):
    from ..sources.datasource import register_lance_datasource

    register_lance_datasource(spark)
    d = load_table(spark, sf_dir, "documents")
    path = _workdir("formatapi", sf_dir)
    d.write.format("lance").mode("overwrite").save(path)
    return (
        spark.read.format("lance").load(path)
        .filter(F.col("n_chars") > 150)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
    )


@register(
    "source_pushdown_read",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE lang = 'en' AND n_chars > 200
    """,
    doc="Pushdown forwarding through the dataset reader: configured "
        "read.filter + query filter compose by AND; column pruning to 3 "
        "columns (ref table/LanceDynamicTableSource.java:350-363, §2.2).",
)
def source_pushdown_read(spark, sf_dir):
    from ..options import DatasetOptions

    d = load_table(spark, sf_dir, "documents")
    path = _workdir("pushdown", sf_dir)
    write_dataset(d, path, mode="overwrite")
    opts = DatasetOptions(path=path, read_filter="lang = 'en'")
    return read_dataset(spark, path, columns=["doc_id", "lang", "n_chars"],
                        filter="n_chars > 200", options=opts)
