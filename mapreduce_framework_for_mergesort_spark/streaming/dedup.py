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
