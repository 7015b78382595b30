"""Plan-audit tool correctness: the counters every shape pin relies on.

Round-3 advisories: (a) ``audit(final=True)`` read the plan after a
noop-sink write, which executes a SEPARATE QueryExecution — the audited
DataFrame's own plan stayed ``isFinalPlan=false``; (b) the exchange
counter's ``(?<!Broadcast)`` guard still matched ``ReusedExchange``,
counting a reused broadcast as a shuffle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.plans import audit, parse_plan

SYNTHETIC_PLAN = """
AdaptiveSparkPlan isFinalPlan=true
+- SortMergeJoin
   :- Exchange hashpartitioning(k#1, 32)
   :  +- FileScan parquet [k#1]
   +- BroadcastExchange HashedRelationBroadcastMode
   +- ReusedExchange [k#9], BroadcastExchange HashedRelationBroadcastMode
   +- Exchange rangepartitioning(k#1 ASC, 32)
"""


def test_parse_plan_exchange_counters_exclude_reuse():
    a = parse_plan(SYNTHETIC_PLAN)
    # the two real shuffles — NOT the BroadcastExchange, and NOT the
    # ReusedExchange (whose node text even names the broadcast it reuses)
    assert a.exchanges == 2
    assert a.broadcasts == 2  # the Broadcast itself + the Reused's label
    assert a.reused_exchanges == 1


def test_audit_final_reads_runtime_final_plan(spark):
    df = (
        spark.range(100_000)
        .withColumn("k", F.col("id") % 7)
        .groupBy("k")
        .count()
    )
    speculative = audit(df)
    assert "isFinalPlan=false" in speculative.text
    ran = audit(df, final=True)
    assert "isFinalPlan=true" in ran.text, ran.text[:500]
    # and the speculative read didn't lie about shape: still one shuffle
    assert ran.exchanges >= 1
