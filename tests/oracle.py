"""Local mirror of the driver's t2 correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares row count, schema (column names), and an
order-insensitive exact value comparison (sorted rows, columns ordered by
name) — stricter than a hash: mismatches show the offending rows.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from mapreduce_framework_for_mergesort_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> list[tuple]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v: Any) -> Any:
    """Normalize values for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # datetimes compare fine when tz-naive on both sides (session tz UTC)
    return v


def _key(row: tuple) -> tuple:
    return tuple(
        (x is None, "" if x is None else str(type(x)), _norm(x)) for x in row
    )


def compare_query(spark, name: str, sf_dir: str, queries, oracles) -> None:
    """Assert Spark result == DuckDB oracle result for query ``name``."""
    sdf = queries[name](spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    srows = [tuple(r[c] for c in spark_cols) for r in sdf.collect()]

    ocols, orows_raw = run_oracle(oracles[name], sf_dir)
    assert sorted(ocols) == spark_cols, (
        f"{name}: column mismatch spark={spark_cols} oracle={sorted(ocols)}"
    )
    idx = [ocols.index(c) for c in spark_cols]
    orows = [tuple(r[i] for i in idx) for r in orows_raw]

    assert len(srows) == len(orows), (
        f"{name}: row count spark={len(srows)} oracle={len(orows)}"
    )
    s_sorted = sorted((_key(r) for r in srows))
    o_sorted = sorted((_key(r) for r in orows))
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        assert a == b, (
            f"{name}: first value mismatch at sorted row {i}:\n"
            f"  spark : {a}\n  oracle: {b}"
        )
