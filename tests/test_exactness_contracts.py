"""Cross-implementation exactness contracts.

The engine's order-independent aggregation discipline rests on two
quantization claims; pin both against Spark itself:

* ``streaming.stateful._to_cents`` (Python) must equal Spark's
  ``CAST(double AS DECIMAL(18,2))`` for arbitrary doubles — that is
  what lets the streaming sessionizer's integer-cent totals hash-match
  the DECIMAL-sum batch oracle.
* ``approx_count_distinct`` (HLL++, the mergeable one-pass 100 TB path
  for q_profile_stats' exact distinct counts) must land within its
  documented error bound — sketches aren't cross-engine reproducible,
  so they are tolerance-bounded instead of oracled.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.streaming.stateful import _to_cents


def test_to_cents_matches_spark_decimal_cast(spark):
    rng = random.Random(42)
    vals = [round(rng.uniform(-1000, 1000), rng.randint(0, 8)) for _ in range(5000)]
    vals += [0.005, -0.005, 12.345, -12.345, 2.675, 0.0, 999.995]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.select(
        (F.col("v").cast("decimal(18,2)") * 100).cast("long").alias("cents")
    ).collect()
    for v, row in zip(vals, got):
        assert _to_cents(v) == row["cents"], v


def test_approx_count_distinct_within_bound(spark, sf_oracle):
    from mapreduce_framework_for_mergesort_spark.io import load_table

    li = load_table(spark, sf_oracle, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.count_distinct("l_orderkey").alias("exact"),
    ).collect()[0]
    # rsd=0.02 → bound generously at 3 sigma
    assert abs(row["approx"] - row["exact"]) <= 0.06 * row["exact"], row
