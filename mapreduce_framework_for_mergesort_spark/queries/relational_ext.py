"""Extended relational coverage: semi/anti joins, cube + grouping id,
pivot/unpivot, broadcast range(band) join, exact percentiles, scalar
subqueries, window-function breadth, salted (skew-safe) aggregation,
systematic sampling, and scalar string/date/math + array function
bundles — each with an exact DuckDB oracle.

The reference implements none of these (SURVEY.md §2: "no joins of any
kind, no group-by … no window functions … no set operations, no
string/date/math/array scalar functions"); they complete the relational
surface a pipeline built on the engine needs.

Cross-engine discipline (see ``queries/__init__``): DECIMAL aggregates,
BIGINT casts on engine-int-width functions (``length``, ``year``,
``ntile``, ``grouping``…), no libm transcendentals (``ln``/``exp``/
``pow`` may differ in the last ulp between implementations — ``sqrt``
and IEEE +-*/ are exact and allowed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import relational as R
from mapreduce_framework_for_mergesort_spark.queries import query


@query(
    "q_semi_anti_join",
    oracle="""
    SELECT 'has_orders' AS tag, c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'no_orders' AS tag, c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / NOT EXISTS as left-semi / left-anti joins.  Semi joins
    shuffle only the key column of the probe side and never duplicate
    matched rows — at 100 TB this is the correct shape for "customers
    with any order", not a join+distinct."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cond = customer["c_custkey"] == orders["o_custkey"]
    has = customer.join(orders, cond, "left_semi").select(
        F.lit("has_orders").alias("tag"), "c_custkey"
    )
    hasnt = customer.join(orders, cond, "left_anti").select(
        F.lit("no_orders").alias("tag"), "c_custkey"
    )
    return has.unionByName(hasnt)


@query(
    "q_cube_grouping",
    oracle="""
    SELECT c_mktsegment, c_nationkey,
           CAST(2 * GROUPING(c_mktsegment) + GROUPING(c_nationkey) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY CUBE(c_mktsegment, c_nationkey)
    """,
)
def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with a grouping id distinguishing real NULLs from rollup
    NULLs — one pass expands to all 4 grouping sets before the shuffle."""
    return (
        load_table(spark, sf_dir, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            R.dec_sum("c_acctbal", alias="sum_bal"),
        )
        .select("c_mktsegment", "c_nationkey", "gid", "n", "sum_bal")
    )


@query(
    "q_pivot_status",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide).  The value list is given explicitly so Spark
    skips the extra values-discovery job — mandatory at scale, where that
    first pass would be a full extra scan."""
    piv = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"status_{s.lower()}")
            for s in ("F", "O", "P")
        ],
    )


@query(
    "q_unpivot_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS val FROM part
    """,
)
def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long, a.k.a. melt) — pure narrow map, no shuffle."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ["p_partkey"], ["p_size", "p_retailprice"], "metric", "val"
    )


@query(
    "q_range_band_join",
    oracle="""
    SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM part
    JOIN (VALUES (0, 900.0, 920.0), (1, 920.0, 940.0), (2, 940.0, 960.0),
                 (3, 960.0, 980.0), (4, 980.0, 1000.0)) AS bands(band, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    """,
)
def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against a broadcast band table: broadcast nested-loop
    with an interval predicate.  The fact side never shuffles; with k
    bands each row tests k intervals — fine for small k, and the shape an
    IVF-style bucketing also uses (similarity_family)."""
    bands = load_table(spark, sf_dir, "part").sparkSession.createDataFrame(
        [(0, 900.0, 920.0), (1, 920.0, 940.0), (2, 940.0, 960.0),
         (3, 960.0, 980.0), (4, 980.0, 1000.0)],
        "band long, lo double, hi double",
    )
    joined = R.band_join(
        load_table(spark, sf_dir, "part"), bands, "p_retailprice"
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        R.dec_sum("p_retailprice", alias="sum_price"),
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.50) AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (continuous-interpolation) percentiles per group.  At 100 TB
    the exact form needs a per-group sort; ``approx_percentile`` (KLL/GK
    sketch, one pass, mergeable) is the scale path — tested with a
    tolerance bound in tests/ since sketches aren't cross-engine
    reproducible."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.75)").alias("p75"),
    )


@query(
    "q_scalar_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM customer)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above the global mean balance, via scalar subqueries
    through the SQL entry point.  The mean test is rewritten as
    ``bal * n > total`` so the predicate is exact decimal×integer
    arithmetic (a double mean would make the boundary engine-dependent).
    Catalyst plans the two scalar subqueries as one shared tiny aggregate
    broadcast to every scan task."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM customer)
              > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer)
        """
    )


@query(
    "q_window_funcs",
    oracle="""
    SELECT o_custkey, o_orderkey,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cum_dist,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (COUNT(*) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS mov_avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: lag/lead, ntile, percent_rank, cume_dist,
    and a rows-frame moving average — one shuffle on the partition key
    serves every function (all share the same window spec).  The moving
    average divides an exact DECIMAL frame-sum by the frame count so both
    engines do the identical double division."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w3 = w.rowsBetween(-2, Window.currentRow)
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
        (
            F.sum(F.col("o_totalprice").cast(R.MONEY)).over(w3).cast("double")
            / F.count(F.lit(1)).over(w3)
        ).alias("mov_avg3"),
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (see ``relational.salted_agg``):
    bit-identical to the plain GROUP BY the oracle runs, but no single
    reducer ever owns a whole hot key."""
    return R.salted_agg(
        load_table(spark, sf_dir, "events"), ["user_id"], "event_id", 16
    )


@query(
    "q_sample_systematic",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    GROUP BY l_returnflag
    """,
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic (systematic, key-modulo) 1-in-50 sample + aggregate.
    Unlike ``TABLESAMPLE``/``df.sample`` this is reproducible across
    engines and runs — the form audits and A/B slices need.  The
    predicate is a cheap narrow filter evaluated at the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_orderkey") % 50 == 0)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            R.dec_sum("l_quantity", alias="sum_qty"),
        )
    )


@query(
    "q_bucketed_join",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join over bucketed tables: both sides are
    written bucketed by the join key (the write pays the shuffle once),
    then the join itself plans with zero exchanges — each task merges
    bucket i of both tables locally.  The no-exchange shape is pinned in
    tests/test_bucketing.py."""
    import hashlib

    from mapreduce_framework_for_mergesort_spark.operators import bucketing as B

    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    t_orders, t_cust = f"orders_b_{tag}", f"customer_b_{tag}"
    B.write_bucketed(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey", "o_totalprice"
        ),
        t_orders,
        ["o_custkey"],
        num_buckets=8,
        sort_cols=["o_custkey"],
    )
    B.write_bucketed(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
        t_cust,
        ["c_custkey"],
        num_buckets=8,
        sort_cols=["c_custkey"],
    )
    joined = B.colocated_join(spark, t_orders, t_cust, "o_custkey", "c_custkey")
    return joined.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        R.dec_sum("o_totalprice", alias="revenue"),
    )


@query(
    "q_scalar_funcs",
    oracle="""
    SELECT o_orderkey,
           upper(o_orderpriority) AS prio_upper,
           substring(o_orderpriority, 1, 1) AS prio_code,
           CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
           concat(o_orderstatus, '#', CAST(o_orderkey AS VARCHAR)) AS status_key,
           lpad(CAST(o_custkey AS VARCHAR), 12, '0') AS cust_pad,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(day(o_orderdate) AS BIGINT) AS o_day,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           abs(o_totalprice) AS abs_price,
           floor(o_totalprice) AS floor_price,
           ceil(o_totalprice) AS ceil_price,
           sqrt(o_totalprice) AS sqrt_price,
           CAST(o_orderkey % 7 AS BIGINT) AS key_mod7
    FROM orders
    """,
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function bundle (string / date / math) — all JVM-side
    builtins inside one whole-stage-codegen projection; zero Python.
    ``sqrt`` and +-*/ are IEEE-exact cross-engine; libm transcendentals
    (``ln``/``exp``/``pow``) are deliberately excluded from oracle
    checks (last-ulp divergence between implementations)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.concat(
            F.col("o_orderstatus"), F.lit("#"), F.col("o_orderkey").cast("string")
        ).alias("status_key"),
        F.lpad(F.col("o_custkey").cast("string"), 12, "0").alias("cust_pad"),
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.abs("o_totalprice").alias("abs_price"),
        F.floor("o_totalprice").cast("double").alias("floor_price"),
        F.ceil("o_totalprice").cast("double").alias("ceil_price"),
        F.sqrt("o_totalprice").alias("sqrt_price"),
        (F.col("o_orderkey") % 7).cast("long").alias("key_mod7"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           embedding[1] AS first_val,
           embedding[len(embedding)] AS last_val,
           array_to_string(
               list_transform(
                   embedding[1:3],
                   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
               ), ',') AS head3_csv
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function bundle over the embedding column: size, element
    access, slicing, transform, join — all JVM builtins (no UDF), the
    primitives the similarity family composes.

    The slice is emitted as a CSV of micro-scaled longs, not a raw
    ``array<float>``: the driver's canonicalizer cannot hash array cells
    (round-1 failure), and int-scaling avoids float-to-string formatting
    divergence between engines (float→double widening is exact; x*1e6 and
    round-half-away-from-zero agree bit-for-bit on identical doubles).
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.element_at("embedding", -1).alias("last_val"),
        F.array_join(
            F.transform(
                F.slice("embedding", 1, 3),
                lambda x: F.round(x.cast("double") * 1000000).cast("long").cast("string"),
            ),
            ",",
        ).alias("head3_csv"),
    )
