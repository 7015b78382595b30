"""Bucketed tables: oracle parity + the zero-exchange join guarantee."""

from __future__ import annotations

import hashlib

from mapreduce_framework_for_mergesort_spark.operators import bucketing as B
from mapreduce_framework_for_mergesort_spark.plans import audit
from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES

from tests.oracle import compare_query


def test_q_bucketed_join_oracle(spark, sf_oracle):
    compare_query(spark, "q_bucketed_join", sf_oracle, QUERIES, ORACLE)


def test_colocated_join_has_zero_exchanges(spark, sf_oracle):
    """The whole point of bucketing: after q_bucketed_join has written the
    tables, joining them on the bucket key must not shuffle either side."""
    QUERIES["q_bucketed_join"](spark, sf_oracle)  # ensure tables exist
    tag = hashlib.sha1(sf_oracle.encode()).hexdigest()[:10]
    joined = B.colocated_join(
        spark, f"orders_b_{tag}", f"customer_b_{tag}", "o_custkey", "c_custkey"
    )
    a = audit(joined)
    assert a.exchanges == 0, a.text
    assert "SortMergeJoin" in a.text, a.text


def test_unbucketed_join_does_shuffle(spark, sf_oracle):
    """Control: the same join through plain parquet (no bucketing, MERGE
    hint pinned) shuffles both sides — proving the zero above is the
    bucketing, not the optimizer eliding the exchange for size reasons."""
    from mapreduce_framework_for_mergesort_spark.io import load_table

    orders = load_table(spark, sf_oracle, "orders").select("o_custkey").hint("MERGE")
    cust = load_table(spark, sf_oracle, "customer").select("c_custkey")
    a = audit(orders.join(cust, orders["o_custkey"] == cust["c_custkey"]))
    assert a.exchanges >= 2, a.text
