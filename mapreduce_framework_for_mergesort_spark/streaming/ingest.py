"""Continuous corpus ingestion with incremental near-dedup.

The batch pipeline (``pipelines.curate_documents``) answers "dedup this
corpus"; a production corpus is not a corpus but a FEED.  This module
is the streaming composition: documents arrive in microbatches, each
batch is near-deduped against everything ACCEPTED SO FAR via the
persisted LSH band index (``operators/dedup.write_lsh_index``), novel
documents are appended to the output table and their bands to the
index — so the corpus and its dedup index grow together and no batch
ever re-bands history.

Semantics (first-arrival-wins): the representative of a near-dup
cluster is the first accepted document; later arrivals that collide
with the index are REJECTED.  This differs deliberately from the batch
operator's min-id survivor — an ingest pipeline must not revoke a
document it already shipped downstream.  Within one microbatch, ties
fall back to the batch rule (min doc_id), keeping the whole history
deterministic for a given batch sequence.

Per microbatch (``foreachBatch``):

1. within-batch near-dedup (``near_dedup_documents`` — exact collapse
   first, then the LSH tier);
2. one equi-join of the batch's bands against the stored index
   (band-partitioned scan; the batch side is tiny) → survivors whose
   band collides with an indexed doc are dropped;
3. append accepted rows to ``out_path`` and their bands to the index.

Scale shape: the stored corpus is NEVER re-banded or re-scanned — each
batch pays O(batch) banding + one index equi-join + two appends; the
index is partitioned by band_id so the join prunes band-aligned files.

Delivery honesty: ``foreachBatch`` parquet appends are NOT
transactional across epoch retries — a batch that fails mid-append and
retries can duplicate accepted rows (at-least-once).  The streaming
file SINK (``sources.run_to_parquet``) gets exactly-once from its
manifest; this composition trades that for the index side effect.  In
production put both appends behind a transactional table format, or
make the retry idempotent by keying the output on doc_id and
deduplicating readers.  Tested here with availableNow drains (no
failure injection), where the sequence is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.operators.dedup import (
    minhash_bands,
    near_dedup_documents,
    write_lsh_index,
)


def _read_index(spark, index_path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(index_path)
    except Exception:
        return None  # first batch: no index yet


def accept_batch(
    batch: DataFrame, index_path: str, out_path: str
) -> None:
    """One ingest step (the ``foreachBatch`` body, callable directly
    for batch backfills): near-dedup ``batch`` within itself and
    against the index, append the accepted docs + their bands."""
    spark = batch.sparkSession
    survivors = near_dedup_documents(batch)
    idx = _read_index(spark, index_path)
    if idx is not None:
        nb = minhash_bands(survivors).select("doc_id", "band_id", "band_val")
        hit = (
            nb.join(
                idx.select("band_id", "band_val"),
                ["band_id", "band_val"],
                "semi",
            )
            .select("doc_id")
            .distinct()
        )
        accepted = survivors.join(hit, "doc_id", "anti")
    else:
        accepted = survivors
    # Materialize the accept decision ONCE (localCheckpoint would also
    # work; count() is the foreachBatch idiom) so the two appends below
    # cannot diverge: writing rows from one evaluation and bands from a
    # re-evaluation would corrupt the index on any nondeterminism.
    accepted = accepted.localCheckpoint()
    accepted.write.mode("append").parquet(out_path)
    write_lsh_index(accepted, index_path, mode="append")


def ingest_documents_stream(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
):
    """Start the continuous ingestion query (``availableNow``-drainable
    in tests; drop the trigger for a long-running feed).  Returns the
    ``StreamingQuery``."""

    def step(batch: DataFrame, _epoch: int) -> None:
        accept_batch(batch, index_path, out_path)

    return (
        docs_stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
