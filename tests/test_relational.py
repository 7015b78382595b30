"""Relational spine: oracle parity + plan-shape assertions."""

from __future__ import annotations

import pytest

from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES

from tests.oracle import compare_query

RELATIONAL_KEYS = [
    "q_join_enrich",
    "q_agg_pricing_summary",
    "q_events_sessionize",
    "q_window_running_total",
    "q_group_topn",
    "q_distinct",
    "q_set_ops",
    "q_rollup",
    "q_json_extract",
    "q_asof_join",
]


@pytest.mark.parametrize("name", RELATIONAL_KEYS)
def test_oracle_parity(spark, sf_oracle, name):
    compare_query(spark, name, sf_oracle, QUERIES, ORACLE)


def test_join_enrich_broadcasts_nation(spark, sf_oracle):
    plan = (
        QUERIES["q_join_enrich"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_pricing_summary_pushes_filter_to_scan(spark, sf_oracle):
    plan = (
        QUERIES["q_agg_pricing_summary"](spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan, plan
