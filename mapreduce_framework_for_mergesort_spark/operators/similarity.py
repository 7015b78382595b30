"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k — a broadcast of the query vector, a
per-row JVM fold, and ``TakeOrderedAndProject``.  No shuffle of the
embedding table at all; at 100 TB this is a single scan, which is the
correct baseline shape (and what FAISS-on-a-cluster degenerates to when
you can't fit an index).

Scale path: random-hyperplane LSH (SimHash for vectors, Charikar '02).
Hyperplane components are derived deterministically from md5 — no RNG
state, so the index is reproducible across runs/engines.  Bucketing cuts
the rerank set by ~2^planes; recall is probabilistic (tested against the
brute-force baseline in ``tests/test_similarity.py``), hence rows-only
oracle status for the ANN query.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import vector as V
from mapreduce_framework_for_mergesort_spark.operators.materialize import (
    materialize,
)

NUM_PLANES = 8


QUANT = 1 << 20  # component quantization scale (see lsh_bucket_udf)

KM_ITERS = 2  # fixed Lloyd iterations — part of the IVF index definition


def hyperplane_matrix_int(dim: int):
    """Deterministic integer (dim × NUM_PLANES) hyperplane matrix:
    component (i, p) is ``2·hexbyte − 255`` where hexbyte is the first
    hex byte of md5('<p>_<i>') — the round-1 ``hexbyte − 127.5`` planes
    scaled by 2 into integers (positive scaling, identical sign
    structure).  Derived from md5, not an RNG — reproducible across
    runs, machines, and engines with no seed state to ship around, and
    *integer* so the dot products below are exact in any summation
    order."""
    import hashlib

    H = np.empty((dim, NUM_PLANES), dtype=np.int64)
    for p in range(NUM_PLANES):
        for i in range(1, dim + 1):
            hx = hashlib.md5(f"{p}_{i}".encode()).hexdigest()[:2]
            H[i - 1, p] = 2 * int(hx, 16) - 255
    return H


def lsh_bucket_udf(dim: int):
    """Arrow-batched bucket assignment: ONE NumPy matmul per batch
    against the md5-derived hyperplane matrix, then sign bits → bucket
    string.

    This replaces a per-row Catalyst HOF fold (8 planes × dim-term
    ``aggregate(zip_with(...))``) that ran interpreted — no codegen —
    at ~10 µs/row (SCALE_NOTES.md measurements); bucketing a 100 TB
    corpus through that expression was the round-1 scale-killer flagged
    in VERDICT.md.  The matmul does the identical arithmetic at BLAS
    speed; the matrix is built on the driver and ships inside the UDF
    closure (dim × 8 int64 — trivially broadcastable).

    Exactness: components are quantized to integers
    (``round-half-away(x · 2^20)``, matching SQL ``round`` semantics)
    and the planes are integers, so every dot product is an exact int64
    sum — independent of summation order.  A BLAS matmul and a SQL
    SUM() therefore agree bit-for-bit, which is what lets
    ``q_embed_ann_lsh`` carry a full DuckDB oracle instead of a
    rows-only check (a float matmul's last-ulp drift vs a SQL fold
    could flip a sign bit on a boundary row)."""
    from pyspark.sql.functions import pandas_udf

    H = hyperplane_matrix_int(dim)
    powers = 1 << np.arange(NUM_PLANES - 1, -1, -1)

    @pandas_udf("string")
    def bucket(emb: pd.Series) -> pd.Series:
        X = np.array(emb.tolist(), dtype=np.float64) * QUANT
        # round half away from zero (SQL round), not numpy's half-even
        Xq = (np.sign(X) * np.floor(np.abs(X) + 0.5)).astype(np.int64)
        codes = ((Xq @ H) >= 0) @ powers  # (n,) ints in [0, 2^planes)
        fmt = f"0{NUM_PLANES}b"
        return pd.Series([format(int(c), fmt) for c in codes])

    return bucket


def duckdb_bucket_cte(dim: int, table: str = "embeddings") -> str:
    """DuckDB CTE replicating the integer LSH bucketing exactly: the
    hyperplane matrix is embedded as a literal VALUES table (the same
    md5-derived constants the UDF uses), the quantized dot is an exact
    BIGINT SUM, and the bucket string aggregates sign bits in plane
    order.  Yields CTEs ``hp(i, p, h)`` and ``buckets(vec_id, bucket)``."""
    H = hyperplane_matrix_int(dim)
    rows = ", ".join(
        f"({i + 1}, {p}, {int(H[i, p])})"
        for p in range(NUM_PLANES)
        for i in range(dim)
    )
    return f"""
    hp(i, p, h) AS (VALUES {rows}),
    dots AS (
      SELECT e.vec_id, hp.p,
             SUM(CAST(round(CAST(e.embedding[hp.i] AS DOUBLE) * {QUANT})
                      AS BIGINT) * hp.h) AS dot
      FROM {table} e, hp
      GROUP BY e.vec_id, hp.p),
    buckets AS (
      SELECT vec_id,
             string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY p) AS bucket
      FROM dots GROUP BY vec_id)
    """


def duckdb_kmeans_cte(
    dim: int,
    num_centroids: int,
    iters: int = KM_ITERS,
    table: str = "embeddings",
) -> str:
    """DuckDB CTE chain replicating ``ivf_cells`` step-for-step —
    quantization, integer-L2 assignment, rounded-mean update, final
    assignment — yielding ``cells(vec_id, embedding, cell)``.  Every
    intermediate is int64 (or one correctly-rounded double division), so
    the two engines agree bit-for-bit on the trained index, same
    discipline as ``duckdb_bucket_cte``."""
    nrm = f"sqrt({V.duckdb_dot('embedding', 'embedding', dim)})"
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (x.xq[i] - c.cq[i]) * (x.xq[i] - c.cq[i])))"
    )
    parts = [
        f"""knorm AS (
      SELECT vec_id, embedding,
             CASE WHEN {nrm} = CAST(0 AS DOUBLE)
                  THEN CAST(1 AS DOUBLE) ELSE {nrm} END AS nrm
      FROM {table}),
    kxq AS (
      SELECT vec_id, embedding,
             list_transform(embedding, v ->
               CAST(round(CAST(v AS DOUBLE) / nrm
                          * CAST({QUANT} AS DOUBLE)) AS BIGINT)) AS xq
      FROM knorm),
    kc0 AS (
      SELECT vec_id AS cid, xq AS cq FROM kxq
      WHERE vec_id < {num_centroids})"""
    ]
    prev = "kc0"
    for t in range(1, iters + 1):
        parts.append(
            f"""ka{t} AS (
      SELECT x.vec_id, c.cid,
             row_number() OVER (PARTITION BY x.vec_id
                                ORDER BY {dist}, c.cid) AS rn
      FROM kxq x CROSS JOIN {prev} c),
    ku{t} AS (
      SELECT a.cid AS cell, ki.i,
             CAST(round(CAST(SUM(x.xq[ki.i]) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cq_i
      FROM ka{t} a
      JOIN kxq x ON x.vec_id = a.vec_id
      CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) ki
      WHERE a.rn = 1
      GROUP BY a.cid, ki.i),
    kc{t} AS (
      SELECT cell AS cid, list(cq_i ORDER BY i) AS cq
      FROM ku{t} GROUP BY cell)"""
        )
        prev = f"kc{t}"
    parts.append(
        f"""kfin AS (
      SELECT x.vec_id, c.cid,
             row_number() OVER (PARTITION BY x.vec_id
                                ORDER BY {dist}, c.cid) AS rn
      FROM kxq x CROSS JOIN {prev} c),
    cells AS (
      SELECT x.vec_id, x.embedding, f.cid AS cell
      FROM kfin f JOIN kxq x ON x.vec_id = f.vec_id
      WHERE f.rn = 1)"""
    )
    return ",\n    ".join(parts)


def brute_force_topk(
    embeddings: DataFrame, query_vec_id: int, k: int
) -> DataFrame:
    """Exact cosine top-k vs. the embedding of ``query_vec_id``.

    Plan: broadcast 1-row query → per-row fold → TakeOrderedAndProject
    (partial top-k per partition; k·P candidates to the driver).
    """
    q = (
        embeddings.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qe"))
    )
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.expr(V.spark_cosine("embedding", "qe")).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(k)


def _xq_transform() -> str:
    """Quantize a (near-)unit embedding to int64: ``round(v / nrm · 2^20)``
    per component, ``nrm`` pre-bound as a real column so the exact fold
    runs once per row, not once per component."""
    return (
        "transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) / __nrm"
        f" * CAST({QUANT} AS DOUBLE)) AS BIGINT))"
    )


def quantize_normalized(embeddings: DataFrame) -> DataFrame:
    """Add ``xq: array<bigint>`` — the L2-normalized embedding quantized
    at 2^20 per component.  All k-means arithmetic downstream is exact
    int64 (order-independent), which is what lets a trained index carry
    a value-exact DuckDB oracle; the norm itself is the engine's
    canonical sequential fold (bitwise equal to DuckDB's ``list_sum``
    formulation, see ``functions/vector.py``)."""
    nrm = f"sqrt({V.spark_dot('embedding', 'embedding')})"
    return (
        embeddings.withColumn(
            "__nrm",
            F.expr(
                f"CASE WHEN {nrm} = CAST(0 AS DOUBLE)"
                f" THEN CAST(1 AS DOUBLE) ELSE {nrm} END"
            ),
        )
        .withColumn("xq", F.expr(_xq_transform()))
        .drop("__nrm")
    )


_INT_L2 = (
    "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
    "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _int_l2_expr(a: str, b: str, dim: int | None) -> str:
    """Exact int64 squared-L2 between two array<bigint> expressions.

    When ``dim`` is known the sum is unrolled into a flat 64-term
    expression (width-sensitive tradeoff measured at 1M rows: a one-dot
    unrolled sum enters whole-stage codegen and beats the fold ~2.7×
    in a flat Project; the 192-term unrolled *cosine* is 3× slower than
    its fold, so only one-dot distances take this path).  int64 addition
    is associative here (no overflow at |xq| ≤ 2^20, dim ≤ 2^22), so
    unrolled and fold are value-identical in any order — the DuckDB
    oracle needs no change."""
    if dim is None:
        return _INT_L2.format(a=a, b=b)
    return " + ".join(
        f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(dim)
    )


def _assign(
    xqv: DataFrame,
    cents: DataFrame,
    carry: tuple[str, ...] = (),
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, xq, …) → (vec_id, …, cell): exact int64 squared-L2
    argmin over the centroids, ties to the lowest cid.

    SHUFFLE-FREE: the C centroids are packed into a single
    array<struct<cid,cq>> row (``collect_list`` — order-irrelevant, the
    min is commutative), broadcast, and the argmin evaluates per row as
    ``array_min(transform(...))`` with struct ordering (d, cid) giving
    the deterministic tie-break.  The round-3 first cut crossJoined the
    C-row centroid table (C× row blowup) and re-grouped by vec_id — a
    full-table shuffle per assignment pass, three per index build; at
    100 TB the shuffles dominate everything else, and this map-only
    form eliminates all of them while also letting ``carry`` payload
    columns ride the row untouched (no ``first()`` re-aggregation).
    The distance inside the lambda is HOF-interpreted either way, so
    ``dim`` matters less here than keeping the pass narrow."""
    packed = cents.agg(
        F.collect_list(F.struct("cid", "cq")).alias("__cents")
    )
    m = (
        "array_min(transform(__cents, c -> "
        f"struct({_int_l2_expr('xq', 'c.cq', dim)} AS d, c.cid AS cid)))"
    )
    return (
        xqv.crossJoin(F.broadcast(packed))
        .withColumn("__m", F.expr(m))
        .select("vec_id", *carry, F.col("__m.cid").alias("cell"))
    )


def kmeans_centroids(
    xqv: DataFrame, num_centroids: int, iters: int = KM_ITERS,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic integer Lloyd's k-means → (cid, cq: array<bigint>).

    Init = the first ``num_centroids`` vectors by vec_id; each iteration
    reassigns by exact int64 L2 and recomputes centroids as the
    rounded component mean ``round(sum / n)`` (int64 sum is exact in any
    order; the one double division is correctly rounded IEEE on both
    engines).  Every step is reproducible arithmetic, so the *trained*
    index is still value-exact against the DuckDB oracle
    (``duckdb_kmeans_cte`` replicates it CTE-for-CTE) — unlike float
    k-means, whose sum order would drift across partitionings.

    The returned centroids are LAZY on purpose: each iteration's
    centroid table has exactly one consumer (the next iteration's — or
    the caller's — broadcast), so the whole chain executes each
    assignment pass exactly once inside the consumer's job; eager
    per-iteration checkpoints (round-3 first cut) added one full scan
    *job launch* per iteration for zero saved work.  Callers that fan
    out the RESULT materialize it themselves (``ivf_topk`` does).
    Cells that lose all members drop out (deterministically, on both
    engines).

    100 TB posture: this is the classic broadcast-centroid pattern —
    per-iteration cost is one scan + one C-row broadcast + two partial
    aggregations (component sums compose map-side); nothing is driver-
    side except the C×dim centroid table itself.
    """
    cents = xqv.where(F.col("vec_id") < num_centroids).select(
        F.col("vec_id").alias("cid"), F.col("xq").alias("cq")
    )
    for _ in range(iters):
        upd = (
            _assign(xqv, cents, carry=("xq",), dim=dim)
            .select("cell", F.posexplode("xq").alias("i", "v"))
            .groupBy("cell", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn(
                "cq_i",
                F.expr(
                    "CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE))"
                    " AS BIGINT)"
                ),
            )
        )
        cents = (
            upd.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "cq_i"))),
                    lambda st: st["cq_i"],
                ).alias("cq")
            )
            .select(F.col("cell").alias("cid"), "cq")
        )
    return cents


def ivf_cells(
    embeddings: DataFrame, num_centroids: int, iters: int = KM_ITERS,
    dim: int | None = None,
) -> DataFrame:
    """IVF index build: train integer k-means centroids
    (``kmeans_centroids``; ``iters=0`` degenerates to the round-2
    first-C-vectors stand-in), then assign every vector to its nearest
    centroid → (vec_id, embedding, cell).

    At 100 TB the cell table is written partitioned by ``cell`` so a
    probe prunes to 1/C of storage (same pattern as
    ``sources.write_partitioned_parquet``).
    """
    xq = materialize(
        quantize_normalized(embeddings).select("vec_id", "embedding", "xq")
    )
    cents = kmeans_centroids(
        xq.select("vec_id", "xq"), num_centroids, iters, dim=dim
    )
    return _assign(xq, cents, carry=("embedding",), dim=dim).select(
        "vec_id", "embedding", "cell"
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int,
    num_centroids: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """IVF ANN: probe only the query's cell, exact cosine rerank inside.

    nprobe=1 keeps the demo deterministic and oracle-checkable (the
    assignment and rerank are exact arithmetic; only *recall* is
    approximate, bounded in tests against the brute-force baseline).

    The cell index is materialized ONCE and shared by the query-row
    lookup and the candidate side — round 2 left it lazy, so the whole
    index build executed in two plan branches (the ``q_embed_ivf_topk``
    bench regression).
    """
    cells = materialize(ivf_cells(embeddings, num_centroids, dim=dim))
    q = cells.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qe"), F.col("cell").alias("qcell")
    )
    cands = cells.join(F.broadcast(q), cells["cell"] == F.col("qcell"))
    scored = cands.select(
        "vec_id", F.expr(V.spark_cosine("embedding", "qe")).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(k)


def lsh_bucketed_topk(
    embeddings: DataFrame, query_vec_id: int, k: int, dim: int = 64
) -> DataFrame:
    """ANN: restrict rerank to the query's LSH bucket, then exact cosine.

    At scale the bucketed table is written once (partitioned by bucket)
    and queries prune to one partition — the scan-everything term drops
    out entirely.
    """
    bucketed = embeddings.withColumn(
        "bucket", lsh_bucket_udf(dim)(F.col("embedding"))
    )
    q = (
        bucketed.where(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").alias("qe"), F.col("bucket").alias("qbucket"))
    )
    cands = bucketed.join(
        F.broadcast(q), bucketed["bucket"] == F.col("qbucket")
    )
    scored = cands.select(
        "vec_id", F.expr(V.spark_cosine("embedding", "qe")).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col("vec_id")).limit(k)
