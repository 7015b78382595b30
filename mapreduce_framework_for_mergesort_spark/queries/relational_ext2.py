"""Second extension wave: explicit GROUPING SETS, conditional/null
functions, time-range window frames, date-function breadth, and a
key-uniqueness audit — all exact-oracled.

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
    SELECT l_returnflag, l_linestatus,
           CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube sugar over):
    one Expand + one aggregate, not three scans."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q_conditional_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
             AS finished_price,
           least(o_totalprice, 250000.0) AS capped,
           greatest(o_totalprice, 1000.0) AS floored
    FROM orders
    """,
)
def q_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling bundle: CASE, nullif+coalesce,
    least/greatest — pure codegen projections (a CASE evaluates per row
    with zero plan cost; the alternative pattern of N filtered unions
    scans N times)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(F.lit(0.0))
        .alias("finished_price"),
        F.least("o_totalprice", F.lit(250000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("floored"),
    )


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
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(week(o_orderdate) AS BIGINT) AS iso_week,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_95
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time breadth: truncation, month boundaries, ISO day-of-week /
    week-of-year, day arithmetic.  Spark's ``dayofweek`` is 1=Sunday;
    both sides are normalized to ISO (1=Monday) — the kind of off-by-one
    that silently corrupts weekly rollups."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").alias("month_end"),
        # Spark dayofweek: 1=Sun..7=Sat → ISO 1=Mon..7=Sun
        ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("long").alias("iso_dow"),
        F.dayofyear("o_orderdate").cast("long").alias("doy"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
        ).cast("long").alias("days_since_95"),
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


@query(
    "q_posexplode",
    oracle="""
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, embedding[i] AS val
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 25 = 0),
         unnest(range(1, len(embedding) + 1)) AS u(i)
    """,
)
def q_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array explode with ordinality (``posexplode``): the long-format
    unpivot of an array column — narrow 1→N generator, no shuffle.
    Sampled (1-in-25 vectors) because the long format multiplies rows by
    the array width; at scale you explode *after* filtering, never
    before."""
    e = load_table(spark, sf_dir, "embeddings").where(
        F.col("vec_id") % 25 == 0
    )
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )


@query(
    "q_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT c_custkey, nullif(c_nationkey % 5, 4) AS grp FROM customer),
    b AS (
      SELECT nullif(n_nationkey % 5, 4) AS grp, COUNT(*) AS n_nations
      FROM nation GROUP BY 1)
    SELECT a.c_custkey, a.grp, b.n_nations
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    """,
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of silently dropping — the semantics
    dimension tables with 'unknown' buckets need.  Still a plain hash
    join on the key (null-safe equality is hashable), not a nested
    loop."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("grp")
    )
    nat = (
        load_table(spark, sf_dir, "nation")
        .select(F.nullif(F.col("n_nationkey") % 5, F.lit(4)).alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )
    return cust.join(F.broadcast(nat), cust["grp"].eqNullSafe(nat["grp"])).select(
        "c_custkey", cust["grp"].alias("grp"), "n_nations"
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket id is one floor-divide (codegen
    projection), then a low-cardinality aggregate — the profile/sanity
    pass every ingest pipeline runs before committing a partition
    layout.  Bucket arithmetic is exact (floor of a double divide on
    identical operands)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.floor(F.col("o_totalprice") / 50000.0).cast("long")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice", alias="sum_price"),
        )
    )


@query(
    "q_corr_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy,
             SUM(CAST(l_quantity AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS corr_qty_price
    FROM m
    """,
)
def q_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group — but NOT via the built-in ``corr``
    (both engines stream doubles through it in partition order, which is
    not reproducible).  The moment sums (Σx, Σy, Σx², Σy², Σxy) are
    DECIMAL — exact and order-free — and the final formula is one fixed
    double expression tree, so the coefficient verifies bitwise."""
    d = "decimal(18,2)"
    x = F.col("l_quantity").cast(d)
    y = F.col("l_extendedprice").cast(d)
    m = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy, sxy = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return m.select("l_returnflag", "n", corr.alias("corr_qty_price"))


@query(
    "q_key_uniqueness",
    oracle="""
    SELECT 'orders.o_orderkey' AS key_name,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderkey) AS n_keys,
           COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_dup_rows
    FROM orders
    UNION ALL
    SELECT 'lineitem.(l_orderkey,l_linenumber)' AS key_name,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_keys,
           COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS n_dup_rows
    FROM lineitem
    """,
)
def q_key_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-uniqueness audit (the data-quality gate every pipeline runs
    before a merge/join): rows vs distinct keys per declared key.  The
    distinct-count is a two-stage aggregate — partial distinct map-side,
    never a global collect."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.agg(
        F.lit("orders.o_orderkey").alias("key_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("o_orderkey").alias("n_keys"),
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("n_dup_rows"),
    )
    l = li.agg(
        F.lit("lineitem.(l_orderkey,l_linenumber)").alias("key_name"),
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("l_orderkey", "l_linenumber").alias("n_keys"),
        (
            F.count(F.lit(1)) - F.count_distinct("l_orderkey", "l_linenumber")
        ).alias("n_dup_rows"),
    )
    return o.unionByName(l)
