"""The correctness driver's exact calling convention: a *vanilla*
SparkSession (none of session.py's confs) passed straight into
``queries()[key](spark, sf_dir)``.

Round 1 lost 5 otherwise-correct events-table queries to this gap — the
nanos-timestamp conf lived only in the session factory, so the driver's
unconfigured session couldn't read events.parquet (VERDICT.md round 1,
"What's wrong" #1).  ``io.load_table`` now sets the runtime-settable confs
itself; this test pins that by *unsetting* them first, which is as vanilla
as a shared-JVM test suite can get.
"""

from __future__ import annotations

import pytest

from mapreduce_framework_for_mergesort_spark.queries import QUERIES

VANILLA_UNSET = [
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.session.timeZone",
]


@pytest.fixture()
def vanilla_spark(spark):
    """Simulate the driver's unconfigured session by stripping the confs
    load_table must not depend on (all runtime-settable, restored after)."""
    saved = {}
    for k in VANILLA_UNSET:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.unset(k)
    yield spark
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "key",
    ["q_events_sessionize", "q_json_extract", "q_asof_join",
     "q_salted_agg", "q_window_time_range"],
)
def test_events_queries_survive_vanilla_session(vanilla_spark, sf_smoke, key):
    if key not in QUERIES:
        pytest.skip(f"{key} not in registry this round")
    df = QUERIES[key](vanilla_spark, sf_smoke)
    assert df.count() >= 0  # the read + plan must not throw


def test_every_query_runs_under_vanilla_session_smoke(vanilla_spark, sf_smoke):
    """Every declared key must at least *plan* against a vanilla session —
    schema resolution forces the reads without paying full execution."""
    for key, fn in QUERIES.items():
        df = fn(vanilla_spark, sf_smoke)
        assert df.schema is not None, key


def test_scoped_session_confs_restores_on_exit(spark, sf_smoke):
    """The scoped alternative to load_table's global mutation: events
    read+collect works inside the block; on exit every conf returns to
    its prior value (including 'was unset')."""
    from mapreduce_framework_for_mergesort_spark.io import (
        load_table,
        scoped_session_confs,
    )

    tz_before = spark.conf.get("spark.sql.session.timeZone", None)
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    with scoped_session_confs(spark):
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        rows = load_table(spark, sf_smoke, "events").limit(5).collect()
        assert len(rows) == 5
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) is None
    assert spark.conf.get("spark.sql.session.timeZone", None) == tz_before
    # restore the suite's expected conf state (other tests load events)
    from mapreduce_framework_for_mergesort_spark.io import (
        set_events_read_confs,
    )

    set_events_read_confs(spark)


def test_scoped_session_confs_restores_on_error(spark):
    from mapreduce_framework_for_mergesort_spark.io import (
        scoped_session_confs,
        set_events_read_confs,
    )

    tz_before = spark.conf.get("spark.sql.session.timeZone", None)
    with pytest.raises(RuntimeError):
        with scoped_session_confs(
            spark, (("spark.sql.session.timeZone", "America/New_York"),)
        ):
            assert (
                spark.conf.get("spark.sql.session.timeZone")
                == "America/New_York"
            )
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.session.timeZone", None) == tz_before
    set_events_read_confs(spark)
