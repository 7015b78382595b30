"""Sort family: operator unit tests + oracle parity (mirrors driver t2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import sort
from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES

from tests.oracle import compare_query

SORT_KEYS = [
    "q_sort_global",
    "q_sort_within_partitions",
    "q_merge_sorted_runs",
    "q_ingest_text_ints",
    "q_filter_nonnull",
    "q_topk",
]


@pytest.mark.parametrize("name", SORT_KEYS)
def test_oracle_parity(spark, sf_oracle, name):
    compare_query(spark, name, sf_oracle, QUERIES, ORACLE)


def test_entry_smoke(spark, sf_smoke):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


def test_with_global_rank_is_dense_and_ordered(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    ranked = sort.with_global_rank(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"]
    )
    rows = (
        ranked.select("rank", "l_extendedprice").orderBy("rank").collect()
    )
    n = li.count()
    assert [r["rank"] for r in rows] == list(range(1, n + 1))
    prices = [r["l_extendedprice"] for r in rows]
    assert prices == sorted(prices)


def test_sort_within_partitions_locally_sorted(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_linenumber"
    )
    out = sort.sort_within_partitions(
        li, ["l_orderkey", "l_linenumber"], num_partitions=8
    )

    def check(it):
        prev = None
        for row in it:
            cur = (row.l_orderkey, row.l_linenumber)
            assert prev is None or prev <= cur, "partition not sorted"
            prev = cur
        return iter([])

    out.rdd.mapPartitions(lambda it: check(it)).count()


def test_topk_matches_full_sort(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    keys = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    top = sort.topk(li, keys, 50).select(*keys).collect()
    full = (
        li.orderBy(*[F.col(k) for k in keys]).limit(50).select(*keys).collect()
    )
    assert top == full
