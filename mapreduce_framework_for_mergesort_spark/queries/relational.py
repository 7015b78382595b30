"""Relational-spine queries: joins, aggregates, set ops, JSON, as-of
join — each with an exact DuckDB oracle.  (Round-1 keys
q_window_running_total / q_distinct / q_rollup were consolidated into
q_window_funcs / q_set_ops / q_grouping_sets respectively — the driver
checks at most 50 keys; operator coverage is unchanged, see README.md.)"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import relational as R
from mapreduce_framework_for_mergesort_spark.queries import query


@query(
    "q_join_enrich",
    oracle="""
    SELECT n_name,
           COUNT(*) AS order_count,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.enrich_revenue_by_nation(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


@query(
    "q_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-side filter pushdown + map-side partial agg —
    the canonical 'reads 100 TB, returns 4 rows' plan."""
    return R.pricing_summary(
        load_table(spark, sf_dir, "lineitem"), "1998-09-02 00:00:00"
    )


@query(
    "q_events_sessionize",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation over the event stream (batch twin of
    ``streaming/windows.py``)."""
    return R.hourly_event_agg(load_table(spark, sf_dir, "events"))


@query(
    "q_group_topn",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def q_group_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return R.top_n_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        3,
    )


@query(
    "q_set_ops",
    oracle="""
    WITH big_spenders AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000),
    rich AS (
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'both' AS tag, custkey FROM (
      SELECT custkey FROM big_spenders INTERSECT SELECT custkey FROM rich) a
    UNION ALL
    SELECT 'rich_only' AS tag, custkey FROM (
      SELECT custkey FROM rich EXCEPT SELECT custkey FROM big_spenders) b
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL in one result, tagged.  Also the
    registry's DISTINCT coverage (round-1 ``q_distinct`` consolidated
    here — the big-spenders branch is a .distinct() hash aggregate)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        orders.where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    rich = customer.where(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    both = big.intersect(rich).select(F.lit("both").alias("tag"), "custkey")
    rich_only = rich.exceptAll(big.intersect(rich)).select(
        F.lit("rich_only").alias("tag"), "custkey"
    )
    return both.unionByName(rich_only)


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (string-JSON column, reference-free
    extension): stays JVM-side via ``get_json_object``."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.get_json_object("props", "$.k").cast("long")
        ).alias("sum_k"),
    )


@query(
    "q_asof_join",
    oracle="""
    WITH cand AS (
      SELECT e.event_id, e.user_id, o.o_orderdate, o.o_orderkey
      FROM events e
      LEFT JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts),
    m AS (
      SELECT event_id, user_id, max(o_orderdate) AS asof_orderdate
      FROM cand GROUP BY event_id, user_id)
    SELECT m.event_id, m.user_id, m.asof_orderdate,
           max(c.o_orderkey) AS asof_orderkey
    FROM m
    LEFT JOIN cand c
      ON c.event_id = m.event_id AND c.o_orderdate = m.asof_orderdate
    GROUP BY m.event_id, m.user_id, m.asof_orderdate
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.asof_latest_order(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "orders"),
    )
