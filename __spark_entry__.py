"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mapreduce_framework_for_mergesort_spark.queries`` — the
engine package owns the registry; this file only re-exports it in the
driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (global total-order sort with scalable rank,
    reference O6) on /root/testdata/sf0.001."""
    return QUERIES["q_sort_global"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (keys without an entry get the
    driver's weaker rows-only check)."""
    return dict(ORACLE)
