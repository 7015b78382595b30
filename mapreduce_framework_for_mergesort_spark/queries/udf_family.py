"""UDF / UDAF / UDTF extension-point queries (seams in
``functions/udf_ext.py``).  The logic is integer/string-exact on purpose:
what's under test is the extension mechanism (Arrow batching, grouped-agg
shuffle placement, UDTF lateral fan-out), verified value-for-value
against oracles that re-derive the same math in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions.udf_ext import (
    SplitWords,
    digit_sum,
    median_long,
)
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.queries import query


@query(
    "q_udf_digit_sum",
    oracle="""
    SELECT CAST(list_sum(list_transform(
             regexp_extract_all(CAST(o_orderkey AS VARCHAR), '[0-9]'),
             x -> CAST(x AS BIGINT))) AS BIGINT) AS ds,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1
    """,
)
def q_udf_digit_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF in a real plan position (projection feeding an
    aggregate).  The plan shows ArrowEvalPython — one Python stage,
    columnar batches — not per-row pickling."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(digit_sum("o_orderkey").alias("ds"))
        .groupBy("ds")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_udaf_median",
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_disc(CAST(l_quantity AS BIGINT), 0.5) AS BIGINT)
             AS med_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF): low-median per group, running
    after the groupBy shuffle with one Arrow batch per group.  DuckDB's
    ``quantile_disc(0.5)`` picks the identical lower-middle element, so
    even a custom aggregate is exactly oracle-checked."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("q")
    )
    # A grouped-agg pandas UDF can't share an .agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — two aggs over the same grouping,
    # joined on the 3-row key, keep both exact.
    med = li.groupBy("l_returnflag").agg(median_long("q").alias("med_qty"))
    cnt = li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    return med.join(F.broadcast(cnt), "l_returnflag")


@query(
    "q_udtf_split",
    oracle=r"""
    SELECT doc_id, toks[i] AS word, CAST(i - 1 AS INT) AS pos
    FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
          FROM documents),
         unnest(range(1, len(toks) + 1)) AS u(i)
    """,
)
def q_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join: one document row fans out to one row
    per token with its position — arbitrary-logic explode with a typed
    output schema."""
    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM documents_udtf d, LATERAL split_words(d.text) s
        """
    )
