"""Loaders for the driver-generated parquet test tables (``TESTDATA.md``).

All reads go through ``spark.read.parquet`` so Catalyst keeps predicate
pushdown and column pruning — at 100 TB these scans are where most time
goes, and a projection that reaches the parquet footer (``ReadSchema`` in
``.explain``) is the difference between reading 2 columns and reading 11.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at every realistic scale
# factor (region=5 rows, nation=25 rows — fixed-size in TPC-H-like schemas
# regardless of SF).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.

    .. warning:: loading ``events`` MUTATES THE SESSION GLOBALLY: it sets
       ``spark.sql.session.timeZone=UTC`` and
       ``spark.sql.legacy.parquet.nanosAsLong=true`` for the session's
       remaining lifetime, changing timestamp semantics for unrelated
       queries run later on the same session in a non-UTC environment.
       This is deliberate and cannot be scoped: the confs are consulted
       at *execution* time, so a save/restore around this (lazy) read
       would silently corrupt the returned DataFrame's later runs.
       Rationale: events.parquet has shipped as TIMESTAMP(NANOS) (which
       Spark's parquet reader rejects outright without the legacy conf)
       and as TIMESTAMP(MICROS, isAdjustedToUTC=false), and the caller
       may hand us a *vanilla* SparkSession (the correctness driver does
       exactly that), so the session-factory conf in ``session.py``
       cannot be relied on.  UTC pins hour()/window() semantics of the
       normalized TIMESTAMP_LTZ to match the timezone-naive DuckDB
       oracle.  Library users who fully consume the DataFrame at a
       known point can avoid the lasting mutation with
       ``scoped_session_confs`` (which restores prior values on exit).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        set_events_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = normalize_events_ts(df)
    return df


# The runtime confs the events read depends on (see the ``load_table``
# warning).  Exposed as data so callers can scope them explicitly.
EVENTS_READ_CONFS: tuple[tuple[str, str], ...] = (
    ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ("spark.sql.session.timeZone", "UTC"),
)


def set_events_read_confs(spark: SparkSession) -> None:
    """Runtime confs the events read depends on, set idempotently (see
    the ``load_table`` warning about the deliberate global mutation)."""
    for k, v in EVENTS_READ_CONFS:
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)


@contextmanager
def scoped_session_confs(
    spark: SparkSession,
    confs: tuple[tuple[str, str], ...] = EVENTS_READ_CONFS,
):
    """Set session confs for the scope of a ``with`` block and restore
    the previous values (or unset, if a key was unset) on exit — the
    library-polite alternative to ``load_table``'s global mutation::

        with scoped_session_confs(spark):
            rows = load_table(spark, sf_dir, "events").collect()

    .. warning:: only safe when every DataFrame whose read depends on
       these confs is FULLY EXECUTED inside the block.  Spark consults
       session confs at *execution* time, not plan time, so a lazy
       DataFrame that escapes the scope executes under the RESTORED
       confs — for the events table that means a rejected
       TIMESTAMP(NANOS) read or hour()/window() results shifted by the
       local timezone.  That execution-time semantics is exactly why
       ``load_table`` cannot scope the confs itself: it returns a lazy
       DataFrame, so the narrow setting would silently corrupt later
       runs.  Use this helper when you control the consumption point;
       let ``load_table`` mutate globally when you don't.
    """
    prev = {k: spark.conf.get(k, None) for k, _ in confs}
    try:
        for k, v in confs:
            spark.conf.set(k, v)
        yield spark
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to a microsecond TIMESTAMP_LTZ whatever
    the on-disk encoding was:

    * TIMESTAMP(NANOS) read as raw ns longs via
      ``spark.sql.legacy.parquet.nanosAsLong`` → rebuild with exact
      integer division (DuckDB truncates the same nanos to µs, so both
      engines agree bit-for-bit).
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) read as TIMESTAMP_NTZ →
      relabel to LTZ.  The session timezone is pinned to UTC first, so
      the cast keeps the wall-clock value and is deterministic; DuckDB
      reads the same column timezone-naive, so hour()/window()/epoch
      arithmetic matches exactly.
    """
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view so ``spark.sql`` works
    against the same names the DuckDB oracle uses — the engine's ad-hoc
    SQL entry point."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
