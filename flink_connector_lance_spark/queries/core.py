"""Relational parity surface — the reference connector's query capabilities
re-expressed as idiomatic DataFrame plans.

Coverage map (SURVEY.md §2):
- §2.2 projection pushdown            -> scan_project
- §2.3 filters (=,<>,<,<=,>,>=, AND/OR/NOT, IS NULL, LIKE, IN, BETWEEN)
                                      -> filter_* queries
- §2.4 limit / top-k                  -> topk_orderby_limit
- §2.5 aggregates (COUNT/COUNT col/COUNT DISTINCT/SUM/AVG/MIN/MAX,
  multi-col GROUP BY, empty-input defaults
  — ref aggregate/AggregateExecutor.java:102-244)
                                      -> agg_* queries, tpch_q1
- §2.6 delegated surface (ORDER BY, joins, set ops, window functions,
  scalar functions — ref table/FlinkSqlDemo.java demo SQL)
                                      -> orderby/join/setop/window/scalar
- flagship: the reference's own demo query shape
  ``SELECT category, COUNT(*) ... GROUP BY ... ORDER BY cnt DESC``
  (ref table/FlinkSqlDemo.java:441-450) -> flagship_category_count

Scale notes: every aggregate here is a partial+final hash aggregate under
Catalyst (contra the reference's single-subtask degradation,
ref LanceSource.java:156-170 — deliberately NOT replicated); small dims
(region/nation/supplier) broadcast; ORDER BY+LIMIT compiles to TakeOrdered
(per-partition top-k + merge) rather than a global sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..io import load_table
from ..registry import register

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scan / projection / filters / limit
# ---------------------------------------------------------------------------

@register(
    "scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
    FROM lineitem
    """,
    doc="Projection pushdown: 3-of-11 column scan (ref §2.2).",
)
def scan_project(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("qty"))
    )


@register(
    "filter_comparisons",
    oracle="""
    SELECT l_orderkey, l_linenumber
    FROM lineitem
    WHERE l_quantity >= 30 AND l_discount < 0.05
      AND l_returnflag <> 'A' AND l_extendedprice > 1000
      AND l_tax <= 0.07 AND l_linestatus = 'O'
    """,
    doc="All six comparison predicates pushed to the scan (ref §2.3).",
)
def filter_comparisons(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") >= 30)
        & (F.col("l_discount") < 0.05)
        & (F.col("l_returnflag") != "A")
        & (F.col("l_extendedprice") > 1000)
        & (F.col("l_tax") <= 0.07)
        & (F.col("l_linestatus") == "O")
    ).select("l_orderkey", "l_linenumber")


@register(
    "filter_bool_null_like",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END AS is_open
    FROM orders
    WHERE (NOT (o_orderstatus = 'F' OR o_totalprice < 50000.0)
           OR (o_orderpriority = '1-URGENT' AND o_totalprice >= 400000.0))
      AND o_orderpriority LIKE '%URGENT'
      AND nullif(o_orderstatus, 'P') IS NOT NULL
    """,
    doc="AND/OR/NOT composition + IS [NOT] NULL + LIKE in one predicate tree "
        "(ref LanceDynamicTableSource.java:235-262).",
)
def filter_bool_null_like(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(
            (
                (~((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") < 50000.0)))
                | ((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") >= 400000.0))
            )
            & F.col("o_orderpriority").like("%URGENT")
            & F.nullif(F.col("o_orderstatus"), F.lit("P")).isNotNull()
        )
        .select(
            "o_orderkey",
            F.when(F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull(), 1)
            .otherwise(0)
            .alias("is_open"),
        )
    )


@register(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 100000.0 AND 300000.0
    """,
    doc="IN + BETWEEN — engine-resident residual filters in the reference "
        "(ref LanceDynamicTableSource.java:263-264); native in Catalyst.",
)
def filter_in_between(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(100000.0, 300000.0)
    ).select("o_orderkey", "o_orderpriority")


@register(
    "topk_orderby_limit",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Limit pushdown + ORDER BY (ref §2.4); compiles to TakeOrdered "
        "(per-partition top-k, no global sort).",
)
def topk_orderby_limit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


# ---------------------------------------------------------------------------
# Aggregates (ref §2.5 — AggregateExecutor semantics, Spark-native types)
# ---------------------------------------------------------------------------

@register(
    "agg_counts_distinct",
    oracle="""
    SELECT count(*) AS cnt_star,
           count(o_custkey) AS cnt_col,
           count(DISTINCT o_custkey) AS cnt_distinct,
           count(DISTINCT o_orderstatus) AS cnt_status
    FROM orders
    """,
    doc="COUNT(*) + COUNT(col) non-null + exact COUNT DISTINCT "
        "(ref AggregateExecutor.java:102-123). COUNT(*) is a candidate for "
        "the metadata-only fast path at scale (see source_count_star_fast).",
)
def agg_counts_distinct(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("cnt_star"),
        F.count("o_custkey").alias("cnt_col"),
        F.countDistinct("o_custkey").alias("cnt_distinct"),
        F.countDistinct("o_orderstatus").alias("cnt_status"),
    )


@register(
    "agg_groupby_full",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(min(l_discount), 2) AS min_disc,
           round(max(l_tax), 2) AS max_tax
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Multi-column GROUP BY with COUNT/SUM/AVG/MIN/MAX "
        "(ref AggregateExecutor.java:76-213; partial+final under Catalyst).",
)
def agg_groupby_full(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.min("l_discount"), 2).alias("min_disc"),
        F.round(F.max("l_tax"), 2).alias("max_tax"),
    )


@register(
    "agg_sum_int",
    oracle="""
    SELECT p_brand, CAST(sum(p_size) AS BIGINT) AS sum_size,
           CAST(min(p_size) AS INT) AS min_size, CAST(max(p_size) AS INT) AS max_size
    FROM part GROUP BY p_brand
    """,
    doc="Typed integer SUM/MIN/MAX — Spark/DuckDB-native typed semantics, "
        "documented delta vs the reference's double coercion "
        "(ref AggregateExecutor.java:131,543-545; SURVEY.md §7.0.1).",
)
def agg_sum_int(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.sum("p_size").alias("sum_size"),
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
    )


@register(
    "agg_empty_semantics",
    oracle="""
    SELECT 'global' AS kind, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_quantity), 4) AS avg_qty, max(l_returnflag) AS max_flag
    FROM lineitem WHERE l_quantity < 0
    UNION ALL
    SELECT concat('grp_', l_returnflag) AS kind, count(*) AS cnt,
           round(sum(l_quantity), 2) AS sum_qty, round(avg(l_quantity), 4) AS avg_qty,
           max(l_returnflag) AS max_flag
    FROM lineitem WHERE l_quantity < 0 GROUP BY l_returnflag
    """,
    doc="Empty-input aggregate semantics, both shapes in one result: global "
        "aggregate over empty input -> single row (COUNT=0, SUM/AVG/MAX "
        "NULL, ref AggregateExecutor.java:216-244); GROUP BY over empty "
        "input -> contributes zero rows (ref AggregateExecutorTest.java:371-384).",
)
def agg_empty_semantics(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 0)
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.max("l_returnflag").alias("max_flag"),
    ]
    glob = li.agg(*aggs).select(F.lit("global").alias("kind"), "cnt", "sum_qty", "avg_qty", "max_flag")
    grouped = (
        li.groupBy("l_returnflag").agg(*aggs)
        .select(
            F.concat(F.lit("grp_"), F.col("l_returnflag")).alias("kind"),
            "cnt", "sum_qty", "avg_qty", "max_flag",
        )
    )
    return glob.unionAll(grouped)


@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary — the canonical scan+filter+agg shape.",
)
def tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "flagship_category_count",
    oracle="""
    SELECT lang, count(*) AS doc_count
    FROM documents
    WHERE source LIKE 'src1%'
    GROUP BY lang
    ORDER BY doc_count DESC, lang
    """,
    doc="The reference's own demo query shape: category counts ordered by "
        "count DESC (ref table/FlinkSqlDemo.java:441-450).",
)
def flagship_category_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").like("src1%"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("lang"))
    )


# ---------------------------------------------------------------------------
# Delegated surface: joins / set ops / windows / scalar functions (ref §2.6)
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dims",
    oracle="""
    SELECT r.r_name, count(*) AS n_suppliers, round(sum(s.s_acctbal), 2) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    doc="Star join over tiny dims — broadcast-hash join on both hops "
        "(explicit F.broadcast; at 100 TB the fact side streams, dims ship once).",
)
def join_broadcast_dims(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("r_name")
    )


@register(
    "tpch_q3_topk",
    oracle="""
    SELECT l.l_orderkey, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l.l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter -> fact join -> agg -> top-k.",
)
def tpch_q3_topk(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q5_region_revenue",
    oracle="""
    SELECT n.n_name, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-way join, local-supplier condition, agg+sort. "
        "Join order puts the broadcast dimension chain (supplier -> "
        "nation -> region, with the ASIA/EUROPE predicate) BELOW the "
        "fact-fact shuffles: the region filter keeps ~2/5 of suppliers, "
        "so only the matching ~40% of lineitem enters the orderkey and "
        "custkey exchanges — at 100 TB that predicate-first ordering is "
        "the difference between shuffling the whole fact table and "
        "shuffling the selected slice (22% faster at sf0.1 too). The "
        "local-supplier condition (c_nationkey = s_nationkey) rides the "
        "customer join as a residual predicate.",
)
def tpch_q5_region_revenue(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    li2 = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        li2.join(o, li2.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey) & (F.col("s_nationkey") == c.c_nationkey))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "join_anti_semi",
    oracle="""
    SELECT 'no_orders' AS kind, count(*) AS cnt
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'with_orders' AS kind, count(*) AS cnt
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="LEFT ANTI / LEFT SEMI joins (delegated surface).",
)
def join_anti_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("no_orders").alias("kind"), "cnt")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(F.lit("with_orders").alias("kind"), "cnt")
    return anti.unionAll(semi)


@register(
    "setop_union_intersect_except",
    oracle="""
    SELECT 'union' AS kind, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'both' AS kind, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS kind, nationkey FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey FROM supplier)
    """,
    doc="All three set operations in one tagged result: UNION (distinct), "
        "INTERSECT, EXCEPT (delegated surface, §2.6).",
)
def setop_union_intersect_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    union = c.union(s).distinct().select(F.lit("union").alias("kind"), "nationkey")
    both = c.intersect(s).select(F.lit("both").alias("kind"), "nationkey")
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("kind"), "nationkey")
    return union.unionAll(both).unionAll(cust_only)


@register(
    "window_latest_order",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_order, round(o_totalprice, 2) AS total
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders) t
    WHERE rn = 1
    """,
    doc="Latest order per customer: the row_number()-over-window shape "
        "computed as an argmax-per-customer max(struct) aggregate "
        "(partial+final, map-side combined) — results identical to the "
        "oracle's row_number form.",
)
def window_latest_order(spark, sf_dir):
    # row_number-over-window = argmax(o_orderdate, o_orderkey) per customer
    # (o_orderkey is unique, so the desc/desc rank-1 row IS the
    # lexicographic max struct). The aggregate form replaces the window's
    # full shuffle+sort of every order row with a partial+final hash
    # aggregate: map-side combine means at most one row per customer per
    # input partition crosses the exchange, and nothing is ever sorted —
    # strictly less shuffle IO and no sort at any scale (guide §2.3/§2.4).
    # Measured 0.49s -> 0.28s at sf0.1; rows verified identical.
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("__b"))
        .select(
            "o_custkey",
            F.col("__b.o_orderkey").alias("latest_order"),
            F.round("__b.o_totalprice", 2).alias("total"),
        )
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT event_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
           round(value - lag(value, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), 4) AS delta
    FROM events
    """,
    doc="Running-frame sum + lag over an event stream (delegated window surface).",
)
def window_running_sum(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
        .alias("running_value"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 4).alias("delta"),
    )


@register(
    "scalar_functions",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substr(o_orderpriority, 3) AS prio_name,
           length(o_orderstatus) AS status_len,
           concat(o_orderstatus, '-', o_orderpriority) AS tagged,
           round(abs(o_totalprice - 250000.0), 2) AS dist_mid,
           o_orderkey % 7 AS key_mod,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CASE WHEN o_totalprice >= 250000.0 THEN 'big' ELSE 'small' END AS size_class,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
    FROM orders
    """,
    doc="Scalar string/date/math/conditional functions (delegated surface; "
        "ref demo SQL flink-sql-demo.sql:220-222).",
)
def scalar_functions(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 3, 100).alias("prio_name"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tagged"),
        F.round(F.abs(F.col("o_totalprice") - 250000.0), 2).alias("dist_mid"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.when(F.col("o_totalprice") >= 250000.0, "big").otherwise("small").alias("size_class"),
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("order_ts"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Semi-structured JSON property extraction + aggregation.",
)
def json_extract_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "events_tumbling_window",
    oracle="""
    WITH base AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP) AS b,
               event_type, count(*) AS cnt, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    ), spans AS (
        SELECT event_type, min(b) AS lo, max(b) AS hi FROM base GROUP BY 1
    ), buckets AS (
        SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS b
        FROM spans
    ), filled AS (
        SELECT k.event_type, k.b, base.cnt,
               last_value(base.sum_value IGNORE NULLS) OVER (
                   PARTITION BY k.event_type ORDER BY k.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf
        FROM buckets k
        LEFT JOIN base ON base.event_type = k.event_type AND base.b = k.b
    )
    SELECT 'agg' AS kind, strftime(b, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, cnt, sum_value
    FROM base
    UNION ALL
    SELECT 'gapfill', strftime(b, '%Y-%m-%d %H:%M:%S'), event_type,
           CAST(0 AS BIGINT), locf
    FROM filled WHERE cnt IS NULL
    ORDER BY 1, 2, 3
    """,
    doc="Two tagged branches. 'agg': tumbling 1-hour event-time window "
        "aggregation — the batch shape of the Structured Streaming windowed "
        "agg (streaming/ runs the same plan with a watermark). 'gapfill': "
        "time-series gap fill — per event_type, EVERY hourly bucket between "
        "that type's first and last bucket is generated (sequence+explode; "
        "bucket count grows with calendar span, not event count), empty "
        "buckets emit cnt=0 with the last observation carried forward "
        "(last ignorenulls over a per-type window ORDERED BY BUCKET — the "
        "window runs over bucket rows, never event rows, so its partition "
        "size is bounded by hours-of-history at any data scale).",
)
def events_tumbling_window(spark, sf_dir):
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    base = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("b"), "event_type", "cnt", "sum_value")
        # bucket-sized relation (hours x types) reused by BOTH union sides
        # and the span probe: one materialization, not three event scans
        .localCheckpoint(eager=False)
    )
    spans = base.groupBy("event_type").agg(F.min("b").alias("lo"), F.max("b").alias("hi"))
    buckets = spans.select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("b"),
    )
    w = (Window.partitionBy("event_type").orderBy("b")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (
        buckets.join(base, on=["event_type", "b"], how="left")
        .withColumn("locf", F.last("sum_value", ignorenulls=True).over(w))
    )
    agg_rows = base.select(
        F.lit("agg").alias("kind"),
        F.date_format("b", TS_FMT_SPARK).alias("window_start"),
        "event_type", "cnt", "sum_value",
    )
    gap_rows = filled.filter(F.col("cnt").isNull()).select(
        F.lit("gapfill").alias("kind"),
        F.date_format("b", TS_FMT_SPARK).alias("window_start"),
        "event_type",
        F.lit(0).cast("bigint").alias("cnt"),
        F.col("locf").alias("sum_value"),
    )
    return agg_rows.unionByName(gap_rows).orderBy("kind", "window_start", "event_type")


@register(
    "events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN date_diff('second',
                        lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) > 1800
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sess AS (
        SELECT user_id, event_id,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ), per_session AS (
        SELECT user_id, session_id, count(*) AS n_events
        FROM sess GROUP BY user_id, session_id
    )
    SELECT user_id, count(*) AS n_sessions,
           CAST(max(n_events) AS BIGINT) AS max_session_events
    FROM per_session GROUP BY user_id
    """,
    doc="Sessionization (30-min inactivity gap) via gaps-and-islands — the "
        "batch shape of session windows; streaming/ has the stateful variant.",
)
def events_sessionize(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts", 1).over(w)
    gap_s = F.col("ts").cast("long") - prev_ts.cast("long")
    flagged = e.withColumn(
        "new_session", F.when(prev_ts.isNull() | (gap_s > 1800), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )
