"""Bucketed tables: co-located (shuffle-free) fact⋈fact joins.

The reference pre-places data only by byte-chunk (``ServerHandler.java:
44-52``) — it has no concept of key-organized storage.  At 100 TB the
single biggest join cost is shuffling both fact sides on the key;
bucketing pays that shuffle **once at write time** and then every
subsequent join/aggregation on the bucket key is exchange-free: each
task reads bucket *i* of both tables and merges locally.

This is the batch analog of what ``repartitionByRange`` does per-query
in the sort family — persisted, so the cost amortizes over every
downstream query.  The join-side demo lives in ``q_bucketed_join``
(queries/relational_ext.py); the no-exchange plan shape is pinned in
``tests/test_bucketing.py`` via ``plans.audit``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    catalog table.  Both sides of a future co-located join must use the
    same ``num_buckets`` and bucket columns."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A location can outlive its catalog entry (fresh metastore, stale
    # warehouse dir — e.g. a new local session over /tmp); managed-table
    # creation refuses to reuse it, so clear any orphan explicitly.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith(("file:", "/")):
        import shutil

        local = warehouse.removeprefix("file:")
        shutil.rmtree(os.path.join(local, table.lower()), ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.

    The MERGE hint pins sort-merge join (a small side would otherwise be
    broadcast, which also avoids the shuffle but hides the bucketing
    guarantee this operator exists to provide); with matching bucket
    counts Catalyst plans it with **zero** exchanges.
    """
    left = spark.table(left_table).hint("MERGE")
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
