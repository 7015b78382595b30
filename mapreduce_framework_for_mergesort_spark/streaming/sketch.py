"""Incremental Count-Min maintenance over a stream.

The CMS is mergeable by elementwise addition (``operators/sketches``),
which makes the streaming composition trivial AND exactly-once: each
microbatch's sketch is written to its own ``epoch=N`` partition with
``overwrite`` — a retried epoch overwrites its own partition
idempotently, so double-counting is structurally impossible (contrast
the ``append``-based ingest path, whose at-least-once caveat is
documented in ``streaming/ingest.py``).  Reads merge all epochs with
one bounded aggregation: every epoch partition is ≤ d·w rows BY
CONSTRUCTION, so the stored sketch grows by at most d·w rows per
microbatch regardless of stream volume, and ``compact_frequency_
sketch`` folds history back to a single ≤ d·w-row partition whenever
the epoch count itself gets long.

This is the 100 TB shape for streaming frequency monitoring (token /
domain / user-id heavy hitters over an unbounded stream): per-batch
work is one map-side-combined count capped at d·w cells, state is
bounded metadata, and the whole thing stays value-verifiable because
the batch operator it composes is (``cms_*`` grains of
``q_profile_stats``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_sketch,
)


def update_frequency_sketch(
    batch: DataFrame, epoch: int, sketch_path: str, key: str
) -> None:
    """One microbatch step (the ``foreachBatch`` body, callable
    directly for backfills): sketch the batch and overwrite THIS
    epoch's partition.  Idempotent under retries — a replayed epoch
    replaces its own cells, never appends."""
    cms_sketch(batch, key).write.mode("overwrite").parquet(
        f"{sketch_path}/epoch={epoch}"
    )


def read_frequency_sketch(spark: SparkSession, sketch_path: str) -> DataFrame:
    """The merged sketch across all stored epochs: one bounded
    aggregation (≤ d·w cells per epoch).  Equal, cell-for-cell, to
    ``cms_sketch`` over the concatenated batches — pinned in tests."""
    return (
        spark.read.parquet(sketch_path)
        .groupBy("i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def compact_frequency_sketch(spark: SparkSession, sketch_path: str) -> None:
    """Fold all epochs into a single ``epoch=0`` partition (the merged
    sketch is itself ≤ d·w rows).  Reads are already correct without
    this; compaction just bounds the file count after long streams.
    The merge is materialized driver-side before the overwrite — it is
    ≤ d·w (= CMS_D × CMS_W = 2048) rows of integers by construction,
    the same bounded-metadata argument as the IVF centroid collects —
    because overwriting a directory a lazy plan still reads from would
    race."""
    merged = read_frequency_sketch(spark, sketch_path).collect()
    df = spark.createDataFrame(merged, "i int, bucket int, cnt bigint")
    import shutil

    tmp = f"{sketch_path}__compact_tmp"
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/epoch=0")
    shutil.rmtree(sketch_path)
    shutil.move(tmp, sketch_path)


def frequency_sketch_stream(
    stream: DataFrame, sketch_path: str, checkpoint_dir: str, key: str
):
    """Wire a streaming DataFrame into the incremental sketch: one
    ``foreachBatch`` writer, epoch-keyed idempotent updates.  Returns
    the started query (``availableNow`` trigger, same harness contract
    as ``ingest_documents_stream``)."""

    def step(batch: DataFrame, epoch: int) -> None:
        update_frequency_sketch(batch, epoch, sketch_path, key)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
