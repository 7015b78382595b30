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

NUM_PLANES = 8


QUANT = 1 << 20  # component quantization scale (see lsh_bucket_udf)


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


def ivf_cells(embeddings: DataFrame, num_centroids: int) -> DataFrame:
    """IVF index build: assign every vector to its nearest centroid.

    Centroids here are the first ``num_centroids`` vectors by ``vec_id``
    — a deterministic stand-in for a k-means pass (the assignment /
    probe / rerank machinery is identical; swapping in trained centroids
    changes recall, not the plan).  Assignment is a broadcast cross join
    (C rows to every task) + per-key argmax via ``max(struct(score,
    -cid))`` style window — one shuffle on vec_id.

    At 100 TB the cell table is written partitioned by ``cell`` so a
    probe prunes to 1/C of storage (same pattern as
    ``sources.write_partitioned_parquet``).
    """
    cents = embeddings.where(F.col("vec_id") < num_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).withColumn(
        "__cscore", F.expr(V.spark_cosine("embedding", "ce"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(
        F.col("__cscore").desc(), F.col("cid")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("vec_id", "embedding", F.col("cid").alias("cell"))
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int,
    num_centroids: int = 8,
) -> DataFrame:
    """IVF ANN: probe only the query's cell, exact cosine rerank inside.

    nprobe=1 keeps the demo deterministic and oracle-checkable (the
    assignment and rerank are exact arithmetic; only *recall* is
    approximate, bounded in tests against the brute-force baseline).
    """
    cells = ivf_cells(embeddings, num_centroids)
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
