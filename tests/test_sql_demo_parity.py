"""End-to-end SQL demo parity: the reference's own demo pipeline
(ref table/FlinkSqlDemo.java:366-631, src/test/resources/flink-sql-demo.sql)
re-run through this engine — DDL-equivalent table creation, INSERT
(append), SELECT/WHERE/ORDER BY/LIMIT, GROUP BY counts, timestamp-range
filters, and the lateral vector_search table function with a _distance
predicate."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from flink_connector_lance_spark.sources.catalog import DatasetCatalog
from flink_connector_lance_spark.sources.datasource import register_lance_datasource
from flink_connector_lance_spark.sources.writer import write_dataset
from flink_connector_lance_spark.udtf import register_vector_search


@pytest.fixture(scope="module")
def demo(spark, tmp_path_factory):
    """document_vectors table (ref FlinkSqlDemo.java:373-397 schema:
    doc_id, title, content, embedding ARRAY<FLOAT>, category,
    create_time TIMESTAMP) in a warehouse catalog."""
    register_lance_datasource(spark)
    wh = str(tmp_path_factory.mktemp("warehouse"))
    cat = DatasetCatalog(wh)
    cat.create_database("demo")
    rows = [
        (i,
         f"Document {i}",
         f"content body {i} with searchable words",
         [float((i * 7 + j) % 10) / 10.0 for j in range(8)],
         ["tutorial", "guide", "reference"][i % 3],
         dt.datetime(2024, 1, 1) + dt.timedelta(hours=i))
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, title string, content string, "
              "embedding array<float>, category string, create_time timestamp")
    path = cat.table_location("demo", "document_vectors")
    df.write.format("lance").mode("overwrite").save(path)
    cat.register_table(spark, "demo", "document_vectors")
    return spark, cat, path


def test_select_where_orderby(demo):
    """ref FlinkSqlDemo.java:424-429 / flink-sql-demo.sql:171-174."""
    spark, _, _ = demo
    out = spark.sql("""
        SELECT doc_id, title, category FROM document_vectors
        WHERE category = 'tutorial'
        ORDER BY create_time DESC
        LIMIT 5
    """).collect()
    assert len(out) == 5
    assert all(r.category == "tutorial" for r in out)
    assert [r.doc_id for r in out] == sorted((r.doc_id for r in out), reverse=True)


def test_groupby_count_orderby_desc(demo):
    """the flagship demo query shape (ref FlinkSqlDemo.java:441-450)."""
    spark, _, _ = demo
    out = spark.sql("""
        SELECT category, COUNT(*) AS doc_count
        FROM document_vectors
        GROUP BY category
        ORDER BY doc_count DESC, category
    """).collect()
    assert [r.category for r in out] == ["guide", "reference", "tutorial"]
    assert [r.doc_count for r in out] == [10, 10, 10]


def test_timestamp_range_where(demo):
    """ref flink-sql-demo.sql:183-186."""
    spark, _, _ = demo
    n = spark.sql("""
        SELECT COUNT(*) AS c FROM document_vectors
        WHERE create_time >= TIMESTAMP '2024-01-01 10:00:00'
          AND create_time <  TIMESTAMP '2024-01-01 20:00:00'
    """).collect()[0].c
    assert n == 10


def test_insert_append_visible_in_sql(demo):
    """INSERT INTO semantics: append a new version, re-register, query."""
    spark, cat, path = demo
    extra = spark.createDataFrame(
        [(1000, "Appended", "late content", [0.5] * 8, "tutorial",
          dt.datetime(2024, 2, 1))],
        "doc_id bigint, title string, content string, embedding array<float>, "
        "category string, create_time timestamp")
    extra.write.format("lance").mode("append").save(path)
    cat.register_table(spark, "demo", "document_vectors")
    n = spark.sql("SELECT COUNT(*) AS c FROM document_vectors").collect()[0].c
    assert n == 31
    assert spark.sql(
        "SELECT title FROM document_vectors WHERE doc_id = 1000"
    ).collect()[0].title == "Appended"


def test_lateral_vector_search_with_distance_filter(demo, sf_dir):
    """ref FlinkSqlDemo.java:591-600: SELECT ... FROM TABLE(vector_search(...))
    WHERE _distance < bound — the UDTF output filtered laterally."""
    spark, _, _ = demo
    register_vector_search(spark)
    path = f"{sf_dir}/embeddings.parquet"
    import math

    q = "array(" + ", ".join(
        f"double({round(math.sin(i + 1) * 0.5, 6)})" for i in range(64)
    ) + ")"
    rows = spark.sql(f"""
        SELECT vec_id, _distance
        FROM vector_search('{path}', 'embedding', {q}, 10, 'l2')
        WHERE _distance < 1000.0
        ORDER BY _distance
    """).collect()
    assert 0 < len(rows) <= 10
    ds = [r._distance for r in rows]
    assert ds == sorted(ds)


def test_catalog_lifecycle_matches_reference(demo):
    """ref LanceConnectorITCase.java:254-281 catalog surface."""
    spark, cat, _ = demo
    assert "demo" in cat.list_databases()
    assert cat.list_tables("demo") == ["document_vectors"]
    cat.rename_table("demo", "document_vectors", "docs_renamed")
    assert cat.table_exists("demo", "docs_renamed")
    cat.rename_table("demo", "docs_renamed", "document_vectors")
    from flink_connector_lance_spark.sources.catalog import Unsupported

    with pytest.raises(Unsupported):
        cat.alter_table("demo", "document_vectors")
    assert cat.get_table_statistics("demo", "document_vectors") is None
