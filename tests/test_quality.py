"""Data-quality constraint gate: verdicts pinned against hand truth
AND a DuckDB recomputation of every observed value."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import quality as Q


def _verdicts(df, checks):
    return {
        (r["kind"], r["column"]): (r["ok"], r["observed"], r["threshold"])
        for r in Q.validate(df, checks).collect()
    }


def test_validate_kinds(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", 20.0),
        (2, None, 35.0),   # dup id, one null cat, value over 30
        (4, "z", None),    # cat outside allowlist, null value
    ]
    df = spark.createDataFrame(rows, ["id", "cat", "v"])
    dim = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    got = _verdicts(
        df,
        [
            ("not_null", "cat", 0.20),
            ("unique", "id"),
            ("range", "v", 0.0, 30.0),
            ("accepted", "cat", ("a", "b"), 0.75),
            ("ref", "id", dim, "k"),
        ],
    )
    assert got[("not_null", "cat")] == (False, 0.25, 0.20)
    assert got[("unique", "id")] == (False, 1.0, 0.0)  # one extra row
    assert got[("range_min", "v")] == (True, 10.0, 0.0)
    assert got[("range_max", "v")] == (False, 35.0, 30.0)
    # 2 of 4 rows in the allowlist (NULL and 'z' are out)
    assert got[("accepted", "cat")] == (False, 0.5, 0.75)
    # id 4 has no dim row; NULLs would not count (none here)
    assert got[("ref", "id->k")] == (False, 1.0, 0.0)


def test_validate_empty_and_nulls_pass_vacuously(spark):
    df = spark.createDataFrame([], "id int, v double")
    got = _verdicts(
        df, [("not_null", "v", 0.0), ("unique", "id"), ("range", "v", 0, 1)]
    )
    assert all(ok for ok, _, _ in got.values())
    # all-NULL column: range passes, not_null fails at frac 1.0
    df2 = spark.createDataFrame([(1, None), (2, None)], "id int, v double")
    got2 = _verdicts(df2, [("range", "v", 0, 1), ("not_null", "v", 0.5)])
    assert got2[("range_min", "v")][0] and got2[("range_max", "v")][0]
    assert got2[("not_null", "v")] == (False, 1.0, 0.5)


def test_validate_against_duckdb_on_fixture(spark, sf_oracle):
    """Every observed value recomputed independently by DuckDB on the
    real orders/customer tables."""
    orders = load_table(spark, sf_oracle, "orders")
    customer = load_table(spark, sf_oracle, "customer")
    got = _verdicts(
        orders,
        [
            ("not_null", "o_orderpriority", 0.5),
            ("unique", "o_orderkey"),
            ("range", "o_totalprice", 0.0, 1e6),
            ("accepted", "o_orderstatus", ("O", "F", "P"), 0.99),
            ("ref", "o_custkey", customer, "c_custkey"),
        ],
    )
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_oracle}/{t}.parquet'"
        )
    n, nulls, dups, lo, hi, acc, orphans = con.execute(
        """
        SELECT (SELECT COUNT(*) FROM orders),
               (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL),
               (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
               (SELECT MIN(o_totalprice) FROM orders),
               (SELECT MAX(o_totalprice) FROM orders),
               (SELECT COUNT(*) FROM orders
                WHERE o_orderstatus IN ('O','F','P')),
               (SELECT COUNT(*) FROM orders o
                WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
                  (SELECT 1 FROM customer c
                   WHERE c.c_custkey = o.o_custkey))
        """
    ).fetchone()
    assert got[("not_null", "o_orderpriority")][1] == nulls / n
    assert got[("unique", "o_orderkey")][1] == float(dups)
    assert got[("range_min", "o_totalprice")][1] == lo
    assert got[("range_max", "o_totalprice")][1] == hi
    assert got[("accepted", "o_orderstatus")][1] == acc / n
    assert got[("ref", "o_custkey->c_custkey")][1] == float(orphans)


def test_assert_valid_gate(spark):
    df = spark.createDataFrame([(1,), (1,)], ["id"])
    Q.assert_valid(df, [("not_null", "id", 0.0)])  # passes silently
    with pytest.raises(ValueError, match="unique\\(id\\)"):
        Q.assert_valid(df, [("unique", "id")])
    with pytest.raises(ValueError, match="unknown check kind"):
        Q.validate(df, [("bogus", "id")])


def test_validate_one_scan(spark, sf_oracle):
    """All scan-local checks share ONE parquet scan (the consolidation
    the module docstring promises)."""
    orders = load_table(spark, sf_oracle, "orders")
    plan = (
        Q.validate(
            orders,
            [
                ("not_null", "o_orderpriority", 0.5),
                ("unique", "o_orderkey"),
                ("range", "o_totalprice", 0.0, 1e6),
                ("accepted", "o_orderstatus", ("O", "F"), 0.5),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan


def test_unique_ignores_null_keys(spark):
    """SQL UNIQUE semantics: NULL keys are not duplicates (count(col)
    vs the old count(*) miscounted every NULL-key row as a dup);
    police NULLs with a paired not_null check instead."""
    from mapreduce_framework_for_mergesort_spark.operators.quality import (
        validate,
    )

    df = spark.createDataFrame(
        [(None,), (None,), (None,), (1,), (2,)], "k: bigint"
    )
    v = {r["kind"]: r for r in validate(df, [("unique", "k")]).collect()}
    assert v["unique"]["ok"] is True
    assert v["unique"]["observed"] == 0.0
    # real duplicates still fail with the right count
    dup = spark.createDataFrame([(1,), (1,), (None,)], "k: bigint")
    r = validate(dup, [("unique", "k")]).collect()[0]
    assert r["ok"] is False and r["observed"] == 1.0


def test_empty_table_and_empty_checks_pass_vacuously(spark):
    from mapreduce_framework_for_mergesort_spark.operators.quality import (
        assert_valid,
        validate,
    )

    empty = spark.createDataFrame([], "status string, k bigint")
    # 'accepted' on an empty table must pass (documented contract —
    # the old 0/1 >= thr failed any thr > 0)
    assert_valid(
        empty,
        [
            ("accepted", "status", ("A", "B"), 0.9),
            ("not_null", "status", 0.0),
            ("unique", "k"),
        ],
    )
    # zero checks: an empty typed verdict frame, not IndexError
    v = validate(empty, [])
    assert v.count() == 0
    assert set(v.columns) == {"kind", "column", "ok", "observed", "threshold"}
    assert_valid(empty, [])
