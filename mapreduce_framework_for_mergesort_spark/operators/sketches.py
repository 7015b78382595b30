"""Exactly-replicable sketches: KMV distinct-cardinality + Count-Min
frequency.  Both follow the same discipline — every intermediate is
plain integer data both engines recompute bit-for-bit, so the driver
can hash-check the sketch itself, not just trust its error bound.

KMV (k-minimum-values) below; Count-Min (``cms_sketch`` et al.) is the
frequency twin: a d×w counter matrix (rows = independent affine hashes
over the shared 32-bit base hash) answering point-frequency queries
with est ≥ true and est ≤ true + 2N/w w.h.p. — the heavy-hitter
primitive at 100 TB, where exact per-key counts of an unbounded key
domain (tokens, URLs, user ids) can't be held.  Mergeable by
elementwise addition; the sketch is ≤ d·w rows BY CONSTRUCTION, so
downstream estimate joins broadcast it.

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


CMS_D = 4  # hash rows (error probability ~ e^-D)
CMS_W = 512  # buckets per row (overestimate ~ 2N/W per Cormode-Muthukrishnan)
CMS_SALT = "#cms"
# Affine bucket family over the shared 32-bit base hash — the MinHash
# constants discipline: a < P = 2^31-1, h < 2^32, so a·h+b < 2^63 is
# exact int64 in Spark SQL, DuckDB, and Python alike.  Seeded
# deterministically so both engines (and every run) agree.
CMS_AB = [
    (H._mh_const("cms_a", i, H.MINHASH_P - 1) + 1, H._mh_const("cms_b", i, H.MINHASH_P))
    for i in range(CMS_D)
]


def _spark_cms_hash(key_sql: str) -> str:
    return H.spark_base_hash(f"CAST({key_sql} AS STRING) || '{CMS_SALT}'")


def duckdb_cms_hash(key_sql: str) -> str:
    return H.duckdb_base_hash(f"CAST({key_sql} AS VARCHAR) || '{CMS_SALT}'")


def cms_bucket_expr(i: int, h_sql: str, w: int = CMS_W) -> str:
    """Row ``i``'s bucket for a precomputed base hash — one SQL string
    valid verbatim in both engines (all operands positive, so ``%`` is
    the same operation everywhere)."""
    a, b = CMS_AB[i]
    return f"((({a} * {h_sql} + {b}) % {H.MINHASH_P}) % {w})"


def _cms_cell_array(d: int, w: int):
    """The (i, bucket) cell-struct array over a precomputed ``__h``
    column — the ONE construction shared by sketch build and probe, so
    the two sides can never drift (a probe computing buckets in a
    different space than the sketch silently estimates 0 and breaks
    est ≥ true).  Validates the (d, w) geometry: the affine family has
    CMS_D rows, and sketch/probe must be called with the SAME pair —
    the sketch rows carry no geometry, so a mismatch is undetectable
    downstream."""
    if not 1 <= d <= len(CMS_AB):
        raise ValueError(
            f"d must be in [1, {len(CMS_AB)}] (the seeded affine "
            f"family size), got {d}"
        )
    if w < 1:
        raise ValueError(f"w must be positive, got {w}")
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.expr(cms_bucket_expr(i, "__h", w)).cast("int").alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan '05) of ``df[key]``'s
    frequency vector as plain DATA: rows ``(i, bucket, cnt)`` — the
    d×w counter matrix with zero cells absent.  ONE scan: each row
    fans out to its d (row, bucket) cells via an array explode, then a
    map-side-combinable count — the shuffle carries at most d·w cells
    per partition regardless of input size.  NULL keys contribute
    nothing (COUNT semantics, mirroring the KMV sketch).

    Like KMV next to approx_count_distinct, this is the cross-engine-
    verifiable stand-in for frequency estimation at 100 TB: every
    intermediate is integer data both engines can recompute
    bit-for-bit, and sketches MERGE by elementwise addition
    (``cms_merge``) so shards/increments sketch locally and combine
    without touching raw data again.

    (d, w) is the sketch GEOMETRY: pass the same pair to every
    ``cms_point_estimates`` over this sketch — the stored rows don't
    carry it, so a mismatch would silently probe the wrong buckets
    (validated as far as possible in ``_cms_cell_array``).

    ``weight_col``: treat each row as ``weight_col`` occurrences of
    ``key`` instead of one — ``cms_sketch(per_key_counts, 'k',
    weight_col='c')`` equals ``cms_sketch(raw, key)`` cell-for-cell
    (pinned in tests), which lets an existing distinct-key aggregate
    pass serve the sketch without rescanning the corpus (the
    ``q_profile_stats`` shared-scan consolidation)."""
    cells = _cms_cell_array(d, w)
    weighted = df.select(
        F.expr(_spark_cms_hash(key)).alias("__h"),
        (
            F.col(weight_col)
            if weight_col is not None
            else F.lit(1).cast("long")
        ).alias("__wt"),
    )
    return (
        weighted.where(F.col("__h").isNotNull())
        .select(F.explode(cells).alias("c"), "__wt")
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("__wt").alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge sketches built with the same (d, w, salt): elementwise
    counter addition — sketch(A ⊎ B) = sketch(A) + sketch(B) exactly
    (pinned in tests), the property that makes the sketch
    distributable and incremental."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_point_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """Frequency estimate per DISTINCT (``key``, ``carry``) combination
    in ``keys``: min over the d counters the key hashes to (missing
    cell → 0 via left join, so never-seen keys estimate
    0..collision-mass).  The final groupBy collapses duplicate keys —
    pass distinct keys per (key, carry) if you need one output row per
    input row (the profile-family and example callers already do).
    Guarantees: est ≥ true count always; est ≤ true + 2N/w with
    probability ≥ 1−e^−d.

    Scale shape: the sketch is ≤ d·w rows BY CONSTRUCTION, so it is
    force-broadcast — the estimate pass is map-side over the keys'
    explode, one small aggregation per key, no shuffle of the sketch
    ever.  ``carry`` payload columns ride through (the ``_assign``
    pattern) so a caller comparing est to a per-key truth doesn't have
    to re-join — and thus re-scan — the keys table."""
    ex = (
        keys.select(
            F.col(key).alias("k"),
            *carry,
            F.expr(_spark_cms_hash(key)).alias("__h"),
        )
        .where(F.col("__h").isNotNull())
        .select(
            "k",
            *carry,
            F.explode(_cms_cell_array(d, w)).alias("__c"),
        )
        .select(
            "k",
            *carry,
            F.col("__c.i").alias("i"),
            F.col("__c.bucket").alias("bucket"),
        )
    )
    joined = ex.join(F.broadcast(sketch), ["i", "bucket"], "left")
    return joined.groupBy("k", *carry).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
    )


def duckdb_cms_cte(
    key_sql: str, table: str, d: int = CMS_D, w: int = CMS_W
) -> str:
    """Oracle CTE chain replicating sketch + estimates vs truth.
    Exposes ``cmsk(i, bucket, cnt)`` and ``cms_est(k, c, est)`` —
    same salted hash, same affine buckets (``cms_bucket_expr``
    verbatim), same left-join-coalesce min."""
    h = duckdb_cms_hash(key_sql)
    cell_branches = "\n      UNION ALL ".join(
        f"SELECT {i} AS i, CAST({cms_bucket_expr(i, 'h', w)} AS INT) AS bucket"
        " FROM cms_h"
        for i in range(d)
    )
    probe_branches = "\n      UNION ALL ".join(
        f"SELECT k, c, {i} AS i, CAST({cms_bucket_expr(i, 'h', w)} AS INT)"
        " AS bucket FROM cms_truth"
        for i in range(d)
    )
    return f"""
    cms_h AS (
      SELECT {h} AS h FROM {table} WHERE {key_sql} IS NOT NULL),
    cmsk AS (
      SELECT i, bucket, COUNT(*) AS cnt
      FROM ({cell_branches})
      GROUP BY 1, 2),
    cms_truth AS (
      SELECT {key_sql} AS k, {h} AS h, COUNT(*) AS c
      FROM {table} WHERE {key_sql} IS NOT NULL GROUP BY 1, 2),
    cms_est AS (
      SELECT k, c, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) AS est
      FROM ({probe_branches}) t
      LEFT JOIN cmsk s USING (i, bucket)
      GROUP BY 1, 2)
    """


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
