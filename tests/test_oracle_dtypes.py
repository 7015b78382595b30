"""Dtype symmetry between every DuckDB oracle and its Spark query.

The driver canonicalizes BOTH sides through pandas before hashing, so a
value-identical result can still hash-red when the *dtypes* drift:

* DuckDB ``SUM(BIGINT)`` returns HUGEINT → pandas float64 (``99111.0``)
  while Spark's long → int64 (``99111``) — the exact bug that cost
  ``q_json_extract`` its green row in round 2;
* ``quantile``/``median`` and ``COUNT(*) FILTER`` have sibling traps.

This test closes the class: for every registered oracle, run it through
``duckdb ... .df()`` at sf0.001 and assert its pandas dtype KIND agrees
with the Spark result schema column-by-column.

One asymmetry is legitimate: a column that actually CONTAINS nulls comes
back float64 from *both* engines' pandas conversions (pandas has no
nullable int64 in the default conversion path), so null-bearing integral
columns are exempted — the drift is symmetric there.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import types as T

from mapreduce_framework_for_mergesort_spark.io import TABLES
from mapreduce_framework_for_mergesort_spark.queries import ORACLE, QUERIES

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOATING = (T.FloatType, T.DoubleType)


def _oracle_df(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize("key", sorted(ORACLE))
def test_oracle_dtype_matches_spark_schema(spark, sf_smoke, key):
    sdf = QUERIES[key](spark, sf_smoke)
    spark_types = {f.name: f.dataType for f in sdf.schema.fields}

    odf = _oracle_df(ORACLE[key], sf_smoke)
    assert sorted(odf.columns) == sorted(spark_types), key

    for col in odf.columns:
        stype = spark_types[col]
        kind = odf[col].dtype.kind  # i/u=int, f=float, O=object, M=datetime
        if isinstance(stype, _INTEGRAL):
            if kind == "f":
                # float64 is only acceptable when forced by actual nulls
                # (symmetric: Spark's toPandas drifts identically then).
                assert odf[col].isna().any(), (
                    f"{key}.{col}: oracle returns float64 for a null-free "
                    f"Spark-{stype.simpleString()} column — likely a DuckDB "
                    f"HUGEINT/DOUBLE result missing a CAST(... AS BIGINT)"
                )
            else:
                assert kind in ("i", "u"), (
                    f"{key}.{col}: oracle dtype kind {kind!r} vs Spark "
                    f"{stype.simpleString()}"
                )
        elif isinstance(stype, _FLOATING):
            assert kind == "f", (
                f"{key}.{col}: oracle dtype kind {kind!r} for a Spark "
                f"{stype.simpleString()} column — missing CAST(... AS DOUBLE)?"
            )
        elif isinstance(stype, T.BooleanType):
            assert kind in ("b", "O"), f"{key}.{col}: {kind!r} for boolean"
        elif isinstance(stype, T.TimestampType):
            assert kind == "M", f"{key}.{col}: {kind!r} for timestamp"
        # strings/decimals/dates land as object on both sides — no trap.
