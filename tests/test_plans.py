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
   +- ReusedExchange [v#3], Exchange hashpartitioning(v#3, 32)
   +- Exchange rangepartitioning(k#1 ASC, 32)
"""


def test_parse_plan_exchange_counters_exclude_reuse():
    a = parse_plan(SYNTHETIC_PLAN)
    # the two real shuffles — NOT the BroadcastExchange, and NOT
    # either ReusedExchange: a reuse NODE LINE embeds its child's
    # description ("ReusedExchange [...], Exchange hashpartitioning")
    # and that embedded text must not count as a new shuffle OR a new
    # broadcast (round-4+ review, verified against a live AQE plan)
    assert a.exchanges == 2
    assert a.broadcasts == 1  # only the real BroadcastExchange node
    assert a.reused_exchanges == 2


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


def test_decontaminate_plan_is_broadcast_semi(spark, sf_oracle):
    """The corpus side of decontamination must never shuffle when the
    flagged set is small: the benchmark's distinct shingles broadcast
    by hint (eval suites are small by definition), and the unbounded
    flagged-id anti-join — deliberately UNhinted, round-4 review —
    gets its broadcast from AQE at runtime, so the check reads the
    FINAL plan."""
    from mapreduce_framework_for_mergesort_spark.io import load_table
    from mapreduce_framework_for_mergesort_spark.operators.dedup import (
        decontaminate,
    )

    docs = load_table(spark, sf_oracle, "documents")
    bench = docs.where("doc_id = 7").select("text")
    a = audit(decontaminate(docs, bench), final=True)
    # both corpus-facing joins must BE broadcast joins (counting
    # BroadcastExchange alone is weaker: a ReusedExchange label also
    # matches, and the anti-join could silently regress to a
    # SortMergeJoin while a stray broadcast keeps the count up)
    assert a.text.count("BroadcastHashJoin") >= 2, a.text[:3000]
    assert "SortMergeJoin LeftSemi" not in a.text, a.text[:3000]
    assert "SortMergeJoin LeftAnti" not in a.text, a.text[:3000]


def test_pack_documents_plan_has_no_global_stage(spark, sf_oracle):
    """Sequence packing must keep the 'no task sees all rows'
    discipline: range exchange for the order, a tiny aggregate for the
    partition offsets (broadcast back), and NO single-partition window
    over data rows."""
    from mapreduce_framework_for_mergesort_spark.io import load_table
    from mapreduce_framework_for_mergesort_spark.operators.sampling import (
        pack_documents,
    )

    docs = load_table(spark, sf_oracle, "documents")
    a = audit(pack_documents(docs, 256))
    assert a.broadcasts >= 1, a  # partition offsets join
    # at most ONE SinglePartition exchange is legitimate — the
    # running-total window over per-partition TOTALS (#partitions rows,
    # not data rows); a second would mean data rows pass through it
    assert a.text.count("Exchange SinglePartition") <= 1, a.text
    # the range exchange lives in the materialization job (the ranged
    # input is checkpointed so the offsets and cumsum branches read the
    # SAME physical rows — round-4 review); this query's own plan reads
    # the checkpoint and runs the Arrow cumsum + the offsets broadcast
    assert "Scan ExistingRDD" in a.text, a.text[:2000]
    assert a.python_evals == 0  # mapInPandas is MapInPandas, not *EvalPython
    assert "MapInPandas" in a.text


def test_parse_plan_codegen_and_final_section_isolation():
    """Compact/final plans mark codegen members with '*(N)' prefixes
    (no 'WholeStageCodegen' node text) — count DISTINCT span ids; and
    audit(final=True) must count only the '== Final Plan ==' section,
    not the appended initial plan (which double-counted every
    operator when PLANS.md generation first ran — round-4+ fix)."""
    starred = """
    *(2) HashAggregate(keys=[k#1])
    +- Exchange hashpartitioning(k#1, 32)
       +- *(1) HashAggregate(keys=[k#1])
          +- *(1) Project [k#1]
    """
    a = parse_plan(starred)
    assert a.codegen_spans == 2  # spans {1, 2}, not 3 markers
    # explicit node text still wins when present
    assert parse_plan("WholeStageCodegen (1)\n*(1) Project").codegen_spans == 1


def test_audit_final_counts_final_section_only(spark):
    df = (
        spark.range(50_000)
        .withColumn("k", F.col("id") % 5)
        .groupBy("k")
        .count()
    )
    a = audit(df, final=True)
    assert "== Initial Plan ==" not in a.text
    assert a.exchanges == 1  # one shuffle, not double-counted
    assert a.codegen_spans >= 1  # starred spans visible in final plan
