"""Streaming deduplication and stream-static enrichment.

Streaming twins of batch operators the engine already has (exact dedup in
``operators/dedup.py``; join enrichment in ``operators/relational.py``).
The reference has neither mode — these are north-star surface.

Dedup state discipline at scale:

* ``dedup_stream`` (plain ``dropDuplicates``) keeps one state row per
  distinct key **forever** — correct and exact, but only viable when the
  key space is bounded (entity ids, (user, type) pairs), not for
  ever-growing ids.
* ``dedup_stream_within_watermark`` bounds state by event time: a key's
  state is dropped once the watermark passes it, so an unbounded id
  space is fine, at the price of re-admitting a duplicate that arrives
  later than the watermark delay.  That trade is the only one available
  on infinite streams — pick the delay to cover the real re-delivery
  window (e.g. Kafka producer retries land within seconds, not days).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(events: DataFrame, keys: list[str]) -> DataFrame:
    """Exact streaming dedup on ``keys`` (state: one row per distinct
    key, kept for the lifetime of the query)."""
    return events.select(*keys).dropDuplicates(keys)


def dedup_stream_within_watermark(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermark-bounded streaming dedup — the unbounded-key-space scale
    path (state dropped once event time passes the watermark)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def near_dup_pairs_stream(documents: DataFrame) -> DataFrame:
    """Streaming NEAR-dup detection: emit LSH candidate pairs
    incrementally as documents arrive — the ingestion-time form of
    ``operators/dedup.lsh_candidate_pairs``.  A pair (a, b) surfaces in
    the microbatch where the LATER of the two documents arrives, so an
    ingest pipeline can flag a near-duplicate the moment it shows up
    instead of waiting for a batch dedup pass.

    Shape: the same Arrow band kernel as batch (tokenize → shingle →
    minhash → band, zero extra Python), exploded to (band_id, band_val,
    doc_id) rows; ``applyInPandasWithState`` keyed by band keeps the
    doc ids seen per band (the streaming LSH *index* as state) and
    emits new×seen pairs.  The drained pair SET is order-independent —
    whatever the arrival order or batching, it equals the batch
    operator's output exactly (pinned in tests), because pair
    membership depends only on band collisions, not timing.

    State discipline: one row per distinct band value, growing with the
    corpus — same asymptotics as the batch index, sharded by the
    groupBy hash.  Hot bands (boilerplate) concentrate both state and
    pair fan-out; production caps docs-per-band (any cap turns the band
    into 'emit against the first K representatives', the standard
    guardrail) — uncapped here to keep exact batch parity.  Callers
    wanting distinct pairs across bands apply ``.dropDuplicates()`` (or
    DISTINCT on the sink), exactly as batch does after its band join.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    from mapreduce_framework_for_mergesort_spark.operators.dedup import (
        minhash_bands,
    )

    # The batch band projection runs unchanged on a streaming DataFrame
    # (pure per-row Arrow kernel) — one definition for both modes, so
    # the 'drained set equals batch' contract can't drift.
    bands = minhash_bands(documents)

    def fn(key, pdfs, state):
        seen: list[int] = list(state.get[0]) if state.exists else []
        incoming = sorted(
            {int(d) for pdf in pdfs for d in pdf["doc_id"]} - set(seen)
        )
        out_a: list[int] = []
        out_b: list[int] = []
        for d in incoming:
            out_a.extend(min(s, d) for s in seen)
            out_b.extend(max(s, d) for s in seen)
            seen.append(d)
        state.update((seen,))
        if out_a:
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    return bands.groupBy("band_id", "band_val").applyInPandasWithState(
        fn,
        outputStructType="doc_a long, doc_b long",
        stateStructType="seen array<bigint>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static inner join: each microbatch joins against the static
    dimension, planned as a broadcast hash join (stateless — no streaming
    state at all).  This is the canonical enrichment shape: the 100 TB/day
    stream never shuffles; the dimension ships to every task."""
    left_key, right_key = on
    return events.join(
        F.broadcast(dim.select(right_key, *dim_cols)),
        events[left_key] == dim[right_key],
        "inner",
    )
