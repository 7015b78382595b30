"""Second extension wave: explicit GROUPING SETS (+ rollup), time-range
window frames, and the CDC merge — all exact-oracled.  (Round-1 keys
q_conditional_funcs / q_date_funcs folded into q_scalar_funcs,
q_posexplode into q_array_funcs, q_nullsafe_join into q_join_variants,
and q_histogram / q_corr_stats / q_key_uniqueness into q_profile_stats
— registry consolidated to the driver's 50-key check budget; the
operator coverage is unchanged, see README.md.)

Cross-engine notes specific to this module:

* day-of-week numbering differs (Spark ``dayofweek``: 1=Sunday; DuckDB
  ``dayofweek``: 0=Sunday) — both sides normalize to ISO (1=Monday).
* ``months_between`` has engine-specific fractional semantics and is
  deliberately excluded; month arithmetic goes through ``date_trunc``.
* time-range window frames: Spark's ``rangeBetween`` needs a numeric
  ordering column, so both engines order by epoch microseconds (exact
  integer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators.relational import dec_sum
from mapreduce_framework_for_mergesort_spark.queries import query


@query(
    "q_grouping_sets",
    oracle="""
    SELECT 'gsets' AS src, l_returnflag, l_linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    UNION ALL
    SELECT 'rollup' AS src, l_returnflag, l_linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over)
    plus the ``.rollup`` DataFrame API (round-1 ``q_rollup``,
    consolidated to the driver's 50-key budget), tagged and unioned.
    Each branch is one Expand + one aggregate, not N scans."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS src, l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )
    rollup = (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dec_sum("l_quantity", alias="sum_qty"),
        )
        .select(
            F.lit("rollup").alias("src"),
            "l_returnflag",
            "l_linestatus",
            "gid",
            "n",
            "sum_qty",
        )
    )
    return gsets.unionByName(rollup)


@query(
    "q_window_time_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS sum_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour *time-range* frame per user (every event sees its
    trailing hour — the rate-limit / rolling-activity shape).  RANGE
    frames bound by event time, not row count; ordering is epoch
    microseconds so the frame arithmetic is exact integers in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )


@query(
    "q_cdc_upsert",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN 'U'
                  WHEN o_orderkey % 7 = 0 THEN 'D' END AS op,
             o_totalprice + 1000.0 AS new_price
      FROM orders
      WHERE o_orderkey % 3 = 0 OR o_orderkey % 7 = 0),
    inserts AS (
      SELECT o_orderkey + 100000000 AS o_orderkey, 'I' AS op,
             o_totalprice AS new_price
      FROM orders WHERE o_orderkey % 11 = 0),
    all_changes AS (
      SELECT * FROM changes UNION ALL SELECT * FROM inserts),
    survivors AS (
      SELECT o.o_orderkey, o.o_totalprice
      FROM orders o
      WHERE NOT EXISTS (
        SELECT 1 FROM all_changes c
        WHERE c.o_orderkey = o.o_orderkey AND c.op IN ('U', 'D'))),
    merged AS (
      SELECT o_orderkey, o_totalprice FROM survivors
      UNION ALL
      SELECT o_orderkey, new_price AS o_totalprice
      FROM all_changes WHERE op IN ('I', 'U'))
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged
    """,
)
def q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: a deterministic change feed (updates on key%3, deletes
    on key%7, inserts with shifted keys on key%11) applied via
    ``operators/upsert.apply_cdc`` — anti-join survivors + union payload
    — then reduced to (row count, exact total) for the oracle."""
    from mapreduce_framework_for_mergesort_spark.operators.upsert import apply_cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    changes = (
        orders.where((k % 3 == 0) | (k % 7 == 0))
        .select(
            "o_orderkey",
            F.when(k % 3 == 0, "U").otherwise("D").alias("op"),
            (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        )
    )
    inserts = orders.where(k % 11 == 0).select(
        (k + 100_000_000).alias("o_orderkey"),
        F.lit("I").alias("op"),
        F.col("o_totalprice"),
    )
    merged = apply_cdc(
        orders, changes.unionByName(inserts), ["o_orderkey"], op_col="op"
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dec_sum("o_totalprice", alias="total"),
    )
