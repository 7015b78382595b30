"""Stream-stream interval (event-time range) join.

The last of the streaming join shapes (stream-static lives in
``dedup.py``): two unbounded inputs joined on key + a bounded event-time
range.  The range bound is what makes it runnable forever — each side's
watermark plus the interval tells Spark exactly how long a row can still
find partners, so buffered state is dropped the moment it can't
(``b.ts ∈ (a.ts, a.ts + interval]`` ⇒ an ``a`` row expires ``interval``
past the right watermark, a ``b`` row as soon as the left watermark
passes it).

Unbounded-state warning: without the time bound this would be a full
stream×stream cross product per key.  Cardinality is inherently
|pairs within the interval| — on a dense key that's quadratic in rate ×
interval, which is a semantic property of the query, not an
implementation defect; pick the interval accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_events(
    probes: DataFrame,
    others: DataFrame,
    interval: str = "6 hours",
    watermark: str = "1 day",
) -> DataFrame:
    """Pairs (probe event, following event of the same user within
    ``interval``).  Both inputs must carry (user_id, ts, event_id,
    event_type)."""
    a = probes.withWatermark("ts", watermark).alias("a")
    b = others.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr(f"INTERVAL {interval}")),
        "inner",
    ).select(
        F.col("a.event_id").alias("probe_id"),
        F.col("a.user_id").alias("user_id"),
        F.col("b.event_id").alias("follow_id"),
        F.col("b.event_type").alias("follow_type"),
    )
