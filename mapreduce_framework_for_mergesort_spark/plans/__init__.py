"""Physical-plan auditing.

The 100 TB posture is enforced as *plan shape*, not hope: every operator
family has tests asserting the plan it must compile to (broadcasts where
a side is small, pushed filters, pruned columns, no stray exchanges).
``audit`` is the shared tool those tests use — it parses
``executedPlan`` into the counts that matter at scale.

Reading an audit:

* ``exchanges`` — each is a full shuffle of its input.  The question is
  never "zero?" but "is each one load-bearing?"  (A global sort needs
  its range exchange; a second exchange of the same data is a bug —
  see ``operators/sort.py`` history.)
* ``broadcasts`` — small side shipped to every task; the *absence* of
  one where a dim table joins a fact is usually a missed
  ``F.broadcast``.
* ``pushed_filters`` / ``read_schemas`` — what actually reached the
  parquet scan.  A filter evaluated post-scan reads 100 TB to drop
  99 TB.
* ``codegen_spans`` — whole-stage-codegen regions; Python UDFs and
  misplaced casts break them apart.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    exchanges: int = 0
    broadcasts: int = 0
    reused_exchanges: int = 0
    file_scans: int = 0
    codegen_spans: int = 0
    python_evals: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    text: str = ""

    def __str__(self) -> str:  # compact one-liner for test failure output
        return (
            f"exchanges={self.exchanges} broadcasts={self.broadcasts} "
            f"scans={self.file_scans} codegen={self.codegen_spans} "
            f"python={self.python_evals}"
        )


def audit(df: DataFrame, final: bool = False) -> PlanAudit:
    """Parse the executed plan into scale-relevant counts.

    Under AQE (the session default) the un-executed plan prints
    ``AdaptiveSparkPlan isFinalPlan=false`` — the speculative initial
    strategy, which AQE may re-plan at runtime (broadcast switches,
    skew splits).  That is the right thing for *shape* pins (the
    initial plan reflects what the operator declared); pass
    ``final=True`` to read the runtime-final plan instead.

    ``final=True`` executes THIS DataFrame's own QueryExecution
    (``executedPlan().execute()`` — for an ``AdaptiveSparkPlanExec``
    that materializes every query stage and fixes the final plan,
    without collecting result rows to the driver).  A noop-sink
    ``df.write`` does NOT work here: the write plans a *separate*
    QueryExecution, so the original ``df``'s plan stays
    ``isFinalPlan=false`` — a round-3 advisory verified empirically."""
    if final:
        df._jdf.queryExecution().executedPlan().execute()
    text = df._jdf.queryExecution().executedPlan().toString()
    # an executed AdaptiveSparkPlan prints BOTH sections — "== Final
    # Plan ==" then "== Initial Plan ==" — so counting the raw string
    # double-counts every operator; keep only the final section
    marker = "== Initial Plan =="
    if marker in text:
        text = text.split(marker, 1)[0]
    return parse_plan(text)


def parse_plan(plan: str) -> PlanAudit:
    """The parsing half of ``audit``, separated so the counters are
    unit-testable against plan text directly."""
    # A ReusedExchange NODE LINE embeds its child's description —
    # "ReusedExchange [k#9], Exchange hashpartitioning(...)" — so the
    # embedded "Exchange "/"BroadcastExchange" would count as a NEW
    # shuffle/broadcast (verified live in a round-4+ review: one real
    # Exchange + one reuse audited as exchanges=2).  Truncate reuse
    # lines to the marker before counting; reuse is its own counter.
    counted = re.sub(r"ReusedExchange[^\n]*", "ReusedExchange", plan)
    return PlanAudit(
        # every shuffle exchange; the lookbehind guards keep
        # BroadcastExchange in its own counter and keep ReusedExchange
        # (a cached result REUSE — often of a broadcast — not a new
        # shuffle) out of both.  Spelled as negative matches, not an
        # allowlist: the round-1 allowlist (range|hash|Single) silently
        # missed RoundRobinPartitioning — a stray repartition() was
        # invisible to the exact tests that exist to catch stray
        # exchanges.
        exchanges=len(
            re.findall(r"(?<!Broadcast)(?<!Reused)Exchange ", counted)
        ),
        broadcasts=counted.count("BroadcastExchange"),
        reused_exchanges=plan.count("ReusedExchange"),
        file_scans=plan.count("FileScan"),
        # two spellings: tree dumps wrap spans in "WholeStageCodegen
        # (N)" nodes, while compact/final plans mark member operators
        # with a "*(N)" prefix — count DISTINCT span ids in that case
        codegen_spans=plan.count("WholeStageCodegen")
        or len(set(re.findall(r"\*\((\d+)\)", plan))),
        python_evals=plan.count("ArrowEvalPython") + plan.count("BatchEvalPython"),
        pushed_filters=re.findall(r"PushedFilters: \[[^\]]*\]", plan),
        read_schemas=re.findall(r"ReadSchema: \S+", plan),
        text=plan,
    )
