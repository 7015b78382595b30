"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is the obvious Spark answer but the wrong one for
training data at scale: its assignment depends on partitioning and seed
plumbing, so re-running after a repartition (or in another engine)
reshuffles examples across train/val/test — a leakage bug.  The durable
contract is *content addressing*: split membership is a pure function of
a stable key, so any engine, any partitioning, any rerun agrees row for
row.

Mechanism: the first two hex chars of ``md5(key)`` give 256 equal-mass
buckets; cumulative weight boundaries are rounded onto bucket edges and
compared LEXICALLY (lowercase hex compares bytewise identically in every
engine — no hex→int conversion, which engines disagree on).  Map-only,
no shuffle, codegen-friendly; resolution is 1/256 of the corpus, plenty
for split ratios.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Weights = list[tuple[str, float]]

DEFAULT_SPLITS: Weights = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


def split_boundaries(splits: Weights = DEFAULT_SPLITS) -> list[tuple[str, str]]:
    """(name, exclusive upper hex-bucket bound) per split, last bound
    open-ended.  Shared by the Spark expression and the DuckDB oracle so
    both derive thresholds from the same arithmetic.

    Non-final bounds cap at 0xff (not 0x100: ``format(256, '02x')``
    yields the 3-char string ``'100'``, which every 2-char hash compares
    AGAINST lexically as greater-or-equal — a near-total misroute).  The
    cap means bucket 0xff always belongs to the last split; at the
    module's documented 1/256 resolution that bias is within the
    quantization error already accepted."""
    total = sum(w for _, w in splits)
    out: list[tuple[str, str]] = []
    cum = 0.0
    for name, w in splits:
        cum += w / total
        out.append((name, format(min(255, int(round(cum * 256))), "02x")))
    return out


def split_column(key: Column, splits: Weights = DEFAULT_SPLITS) -> Column:
    """Split-name column for ``key`` (any type; cast to string first).

    NULL keys go EXPLICITLY to the first (largest, by convention) split:
    md5(NULL) is NULL, so without the guard every WHEN would evaluate
    NULL and the otherwise() branch would silently dump null-keyed rows
    into the LAST split — inflating the eval side, the worst place for
    an accident.  Mirrored in ``duckdb_split_case``."""
    h = F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)
    bounds = split_boundaries(splits)
    expr = F.when(key.isNull(), bounds[0][0])
    for name, ub in bounds[:-1]:
        expr = expr.when(h < ub, name)
    return expr.otherwise(bounds[-1][0])


def hash_split(
    df: DataFrame, key: str, splits: Weights = DEFAULT_SPLITS
) -> DataFrame:
    """Add a ``split`` column assigning each row by content-hash of
    ``df[key]``.  Deterministic across runs, partitionings, and engines;
    rows with equal keys land in the same split (exactly what you want:
    duplicates must not straddle a train/test boundary)."""
    return df.withColumn("split", split_column(F.col(key), splits))


def duckdb_split_case(key_sql: str, splits: Weights = DEFAULT_SPLITS) -> str:
    """The oracle-side CASE expression, from the same boundaries (NULL
    guard included so both engines route null keys identically)."""
    h = f"substring(md5(CAST({key_sql} AS VARCHAR)), 1, 2)"
    bounds = split_boundaries(splits)
    whens = " ".join(
        f"WHEN {h} < '{ub}' THEN '{name}'" for name, ub in bounds[:-1]
    )
    null_guard = f"WHEN {key_sql} IS NULL THEN '{bounds[0][0]}'"
    return f"CASE {null_guard} {whens} ELSE '{bounds[-1][0]}' END"
