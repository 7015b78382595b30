"""Exactly-replicable distinct-cardinality sketch (KMV / k-minimum-values).

``approx_count_distinct`` (HyperLogLog++) is Spark's built-in sketch for
cardinality at 100 TB, and the engine documents it as the scale
substitute for exact ``count_distinct`` — but its sketch bytes are
engine-internal, so no oracle can check it value-for-value.  KMV
(Bar-Yossef et al. '02) has the same one-pass, mergeable,
bounded-memory shape with every intermediate being plain DATA: the k
smallest md5-derived hash values of the key.  Both engines compute md5
identically, min-k is order-independent, and the estimator

    est = (k - 1) * HASH_SPACE // h_k        (h_k = k-th smallest hash)

is pure int64 arithmetic — so the whole sketch, not just its answer,
verifies bit-for-bit against DuckDB (the same exactness discipline as
the integer-quantized LSH in ``operators/similarity.py``).  Standard
error is ~1/sqrt(k-2) (~6% at k=256), bounded in tests.

Scale shape: ``distinct`` of the hash column is a two-stage hash
aggregate (map-side partials emit each partition's distinct hashes
once), then ``orderBy(h).limit(k)`` plans as TakeOrderedAndProject —
per-partition top-k, never a global sort.  The shuffle carries distinct
hashes, not rows; for corpora where even that is too much, prefilter
``h < t`` for a threshold t chosen from a cardinality upper bound
(exactly ``sampling.sample_threshold``'s arithmetic) — the filter is
map-only and KMV only ever looks at the k smallest hashes, so any t
with ≥ k surviving distinct hashes leaves the result unchanged (double
t and rerun on under-fill).

Merge property (what makes the sketch distributable/incremental): the
k smallest distinct hashes of A ∪ B are computable from the two k-min
sets alone — union, distinct, keep the k smallest (pinned in tests).

Hash width is 32 bits (``functions.hashing.spark_base_hash`` — the
same primitive the MinHash family uses), which starts saturating with
birthday collisions around ~2^16 distinct keys per sketch (underestimates
beyond); for production-scale cardinalities widen the substring in a
derived helper rather than reusing this one, or fall back to
``approx_count_distinct`` when cross-engine verifiability isn't needed.
The hash input is SALTED (``#kmv``) so sketch membership is independent
of the hash-split and hash-sample decisions derived from the same key
(see ``sampling.SAMPLE_SALT`` for the correlation failure this avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import hashing as H

KMV_K = 256
KMV_SALT = "#kmv"
KMV_SPACE = 1 << 32  # hash domain size: 8 hex chars (spark_base_hash)


def _spark_kmv_hash(key_sql: str) -> str:
    return H.spark_base_hash(f"CAST({key_sql} AS STRING) || '{KMV_SALT}'")


def duckdb_kmv_hash(key_sql: str) -> str:
    """Oracle-side hash expression (same salt, same 8-hex-char space)."""
    return H.duckdb_base_hash(f"CAST({key_sql} AS VARCHAR) || '{KMV_SALT}'")


def kmv_min_hashes(df: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """The sketch itself: the ``k`` smallest distinct hash values of
    ``df[key]`` as one ``h`` column (NULL keys contribute nothing —
    md5(NULL) is NULL and is filtered, mirroring COUNT DISTINCT).
    This is plain data — persist it, merge it (``kmv_merge``), or
    estimate from it (``kmv_estimate``)."""
    h = F.expr(_spark_kmv_hash(key))
    return (
        df.select(h.alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(sketches: list[DataFrame], k: int = KMV_K) -> DataFrame:
    """Merge per-source sketches into the sketch of the union: union,
    distinct, keep the k smallest — the identity that lets 1000
    executors (or 1000 daily increments) each sketch locally and
    combine without touching raw data again."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("h").limit(k)


def kmv_estimate(df: DataFrame, key: str, k: int = KMV_K) -> DataFrame:
    """One row ``(kk, est_distinct)``: ``kk`` = hashes actually held
    (< k means the sketch saw every distinct key and ``est`` is exact
    by construction), ``est_distinct`` = the KMV estimator in pure
    int64 arithmetic.  ``(k-1) * KMV_SPACE`` ≤ 255·2^32 < 2^63 — no
    overflow, no floating point until the caller casts."""
    agg = kmv_min_hashes(df, key, k).agg(
        F.count(F.lit(1)).alias("kk"), F.max("h").alias("hk")
    )
    return agg.select(
        "kk",
        F.when(F.col("kk") < k, F.col("kk"))
        .otherwise(
            F.expr(f"(kk - 1) * CAST({KMV_SPACE} AS BIGINT) div hk")
        )
        .alias("est_distinct"),
    )


def duckdb_kmv_cte(key_sql: str, table: str, k: int = KMV_K) -> str:
    """Oracle CTE body replicating ``kmv_estimate`` (select from it as
    ``(kk, est_distinct)``) — same hash, same min-k, same integer
    estimator, so the driver hash-checks the sketch value-for-value."""
    return f"""
      SELECT kk,
             CASE WHEN kk < {k} THEN kk
                  ELSE (kk - 1) * CAST({KMV_SPACE} AS BIGINT) // hk
             END AS est_distinct
      FROM (
        SELECT count(*) AS kk, max(h) AS hk FROM (
          SELECT DISTINCT {duckdb_kmv_hash(key_sql)} AS h
          FROM {table} WHERE {key_sql} IS NOT NULL
          ORDER BY h LIMIT {k}))
    """
