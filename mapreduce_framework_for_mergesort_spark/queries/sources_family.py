"""Source/sink round-trip queries: CSV, JSON-lines, partitioned parquet.

Each query serializes a driver table into the target format under a
deterministic /tmp workdir, reads it back through ``sources/formats.py``
(explicit schema, PERMISSIVE corrupt policy), and reduces to an aggregate
the DuckDB oracle computes from the *original* parquet — so the check
proves lossless round-tripping, not just that a read succeeded.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators.relational import dec_sum
from mapreduce_framework_for_mergesort_spark.queries import query
from mapreduce_framework_for_mergesort_spark.sources import formats


def _workdir(sf_dir: str, tag: str) -> str:
    digest = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    return os.path.join("/tmp", "msfs_sources", f"{tag}_{digest}")


CUSTOMER_SCHEMA = StructType(
    [
        StructField("c_custkey", LongType()),
        StructField("c_name", StringType()),
        StructField("c_nationkey", IntegerType()),
        StructField("c_acctbal", DoubleType()),
        StructField("c_mktsegment", StringType()),
    ]
)

EVENTS_JSON_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@query(
    "q_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → CSV → read (explicit schema) → aggregate.  Doubles
    survive because Spark's CSV writer emits shortest-round-trip decimal
    strings; the oracle aggregates the original parquet, so any loss in
    the text hop would hash-mismatch."""
    path = _workdir(sf_dir, "csv_customer")
    formats.write_csv(load_table(spark, sf_dir, "customer"), path)
    back = formats.read_csv(spark, path, CUSTOMER_SCHEMA)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("c_acctbal", alias="sum_bal"),
    )


@query(
    "q_json_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON-lines → read (explicit schema) → aggregate,
    including re-extracting the nested ``props`` JSON string after the
    round-trip (string-in-JSON escaping must be lossless)."""
    path = _workdir(sf_dir, "jsonl_events")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    formats.write_jsonl(ev, path)
    back = formats.read_jsonl(spark, path, EVENTS_JSON_SCHEMA)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dec_sum("value", alias="sum_value"),
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
    )


@query(
    "q_partitioned_parquet",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → parquet partitioned by o_orderstatus → read back filtered
    to one status.  The filter prunes at the *directory* level
    (``PartitionFilters`` in the plan — asserted in tests): at 100 TB the
    'O' and 'P' partitions are never opened, not even their footers."""
    path = _workdir(sf_dir, "part_orders")
    orders = load_table(spark, sf_dir, "orders")
    formats.write_partitioned_parquet(orders, path, ["o_orderstatus"])
    back = formats.read_partitioned_parquet(spark, path)
    return (
        back.where(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dec_sum("o_totalprice", alias="revenue"),
        )
    )
