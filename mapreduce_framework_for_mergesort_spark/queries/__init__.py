"""Query registry backing the driver contract (``__spark_entry__.py``).

Each query key registers (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` and (b) — when ANSI-SQL-expressible — an equivalent DuckDB
oracle SQL string over the same parquet tables.  The driver hash-compares
the two at sf0.01 (row count + schema + order-insensitive value hash),
so every query here is written for *exact* cross-engine agreement:

* every computed column is aliased identically on both sides;
* aggregate arithmetic goes through DECIMAL (exact) and is cast to DOUBLE
  only at the end — raw double summation is order-dependent and would not
  be reproducible even between two Spark runs;
* per-row double expressions are fine (IEEE ops on identical operands in
  an identical tree are bitwise-deterministic in both engines);
* ranks materialize total orders (unique tiebreak keys) as data, making
  *order* checkable through the order-insensitive hash;
* ``row_number()``-style columns are cast to BIGINT to match DuckDB.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` → driver does a rows-only check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        fn.__query_key__ = name
        return fn

    return deco


# Import for side effect: each module registers its family of queries.
# Order matters: the driver checks at most 50 keys in registry order, so
# the reference-parity sort family and the core relational spine lead;
# the registry is kept ≤ 50 keys total (see README.md consolidation map).
from mapreduce_framework_for_mergesort_spark.queries import (  # noqa: E402,F401
    sort_family,
    dedup_family,
    relational,
    relational_ext,
    relational_ext2,
    profile_family,
    text_family,
    similarity_family,
    multimodal_family,
    udf_family,
    sources_family,
    streaming_family,
)

__all__ = ["QUERIES", "ORACLE", "query"]
