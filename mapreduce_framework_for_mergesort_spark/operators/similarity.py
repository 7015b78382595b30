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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import vector as V

NUM_PLANES = 8


def _hyperplane_component(plane: int, i: str) -> str:
    """Deterministic pseudo-random component in [-7.5, 7.5]/7.5: first hex
    digit of md5('<plane>_<i>') recentered.  conv() hex→dec exists in both
    engines' SQL, but only Spark needs it (the oracle never sees planes).
    """
    return (
        f"(CAST(conv(substring(md5(concat('{plane}', '_', CAST({i} AS STRING))), 1, 2), 16, 10) "
        f"AS DOUBLE) - 127.5)"
    )


def _bucket_expr(emb_col: str, dim: int) -> str:
    """Sign-bit bucket string over NUM_PLANES deterministic hyperplanes."""
    bits = []
    for p in range(NUM_PLANES):
        dot = (
            f"aggregate(zip_with({emb_col}, "
            f"transform(sequence(1, {dim}), i -> {_hyperplane_component(p, 'i')}), "
            f"(x, h) -> CAST(x AS DOUBLE) * h), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)")
    return f"concat({', '.join(bits)})"


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
    bucketed = embeddings.withColumn("bucket", F.expr(_bucket_expr("embedding", dim)))
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
