"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import vector as V
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import pq as PQ
from mapreduce_framework_for_mergesort_spark.operators import similarity as S
from mapreduce_framework_for_mergesort_spark.operators.materialize import (
    materialize,
)
from mapreduce_framework_for_mergesort_spark.queries import query

TOPK = 10
QUERY_VEC = 0
DIM = 64


@query(
    "q_embed_topk_sim",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC}),
    s AS (
      SELECT vec_id, {V.duckdb_cosine('embedding', 'qe', DIM)} AS score
      FROM embeddings, q)
    SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
           vec_id, score
    FROM s
    ORDER BY score DESC, vec_id
    LIMIT {TOPK}
    """,
)
def q_embed_topk_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact baseline): broadcast query vector,
    JVM fold per row, TakeOrderedAndProject.  Scores are bitwise equal to
    the DuckDB fold, so the oracle checks values, not just ranks."""
    top = S.brute_force_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_VEC, TOPK
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "score"
    )


NUM_CENTROIDS = 8


@query(
    "q_embed_ivf_topk",
    oracle=f"""
    WITH {S.duckdb_kmeans_cte(DIM, NUM_CENTROIDS)},
    qc AS (
      SELECT cid, rn FROM kfin WHERE vec_id = {QUERY_VEC}),
    q AS (
      SELECT embedding AS qe FROM cells WHERE vec_id = {QUERY_VEC}),
    s1 AS (
      SELECT vec_id, {V.duckdb_cosine('embedding', 'qe', DIM)} AS score
      FROM cells, q
      WHERE cell IN (SELECT cid FROM qc WHERE rn <= 1)),
    s2 AS (
      SELECT vec_id, {V.duckdb_cosine('embedding', 'qe', DIM)} AS score
      FROM cells, q
      WHERE cell IN (SELECT cid FROM qc WHERE rn <= 2)),
    r1 AS (
      SELECT 'p1' AS part,
             CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT)
               AS rank,
             vec_id, score
      FROM s1 ORDER BY score DESC, vec_id LIMIT {TOPK}),
    r2 AS (
      SELECT 'p2' AS part,
             CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT)
               AS rank,
             vec_id, score
      FROM s2 ORDER BY score DESC, vec_id LIMIT {TOPK}),
    {PQ.duckdb_pq_cte(DIM, QUERY_VEC, TOPK)},
    rpq AS (
      SELECT 'pq' AS part, rank, vec_id, score FROM ptop),
    icand AS (
      SELECT vec_id FROM padc
      WHERE vec_id IN (SELECT vec_id FROM cells
                       WHERE cell IN (SELECT cid FROM qc WHERE rn <= 2))
      ORDER BY adc, vec_id LIMIT {4 * TOPK * 2}),
    iscored AS (
      SELECT e.vec_id,
             {V.duckdb_cosine('e.embedding', 'qe', DIM)} AS score
      FROM embeddings e JOIN icand USING (vec_id) CROSS JOIN q),
    itop AS (
      SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id)
                  AS BIGINT) AS rank,
             vec_id, score
      FROM iscored ORDER BY score DESC, vec_id LIMIT {TOPK}),
    ri AS (
      SELECT 'ivfadc' AS part, rank, vec_id, score FROM itop)
    SELECT * FROM r1 UNION ALL SELECT * FROM r2
    UNION ALL SELECT * FROM rpq UNION ALL SELECT * FROM ri
    """,
)
def q_embed_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (trained integer-k-means cells → cell probe → exact
    rerank) as a tagged union over the recall knob (round 4):

    * ``p1`` — nprobe=1 (single nearest cell), the rounds-1-3 contract;
    * ``p2`` — nprobe=2 (two nearest cells in deterministic
      centroid-distance order);
    * ``pq`` — product-quantization ADC search (``operators/pq.py``):
      per-subspace integer codebooks, compressed-domain int64 scoring,
      deterministic candidate cut, exact-cosine rerank — the
      memory-bound ANN tier, with training/encoding/ADC all replicated
      in the oracle's CTE chain;
    * ``ivfadc`` — the composed tier (round 5): ADC scoring restricted
      to the query's nprobe=2 IVF cells before the candidate cut — the
      oracle reuses the kmeans CTE's cell assignment AND the PQ
      chain's ADC table, filtered (``icand``, whose ``LIMIT
      4·k·nprobe`` mirrors the round-9 scaled default r_cand), so the
      full composition is value-verified too.

    Unlike the LSH variant, every step — k-means training, probe-cell
    selection, rerank — is exact deterministic arithmetic, so the
    *whole index + multi-probe search* is oracle-verified
    value-for-value (the oracle's ``kfin`` CTE ranks every vector's
    centroid distances, so the query's nprobe-n cell set is just
    ``rn <= n``); recall vs. brute force is additionally bounded and
    proven monotone in nprobe in tests."""
    emb = load_table(spark, sf_dir, "embeddings")
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    # ONE index build shared by both probe branches: train once,
    # assign the corpus once (materialized — its blocks feed the two
    # cell-filtered reranks), probe per nprobe.  The first cut called
    # ivf_topk per branch, paying the sample collect + Lloyd train +
    # full corpus assignment pass TWICE for one query key (round-4+
    # review) — the in-session analog of write-once/probe-many.
    cents = S._trained_cents(emb, NUM_CENTROIDS)
    cells = materialize(S.assign_cells(emb, cents))
    books = PQ.train_codebooks(emb, DIM)
    parts = []
    for tag, top in (
        ("p1", S.ivf_topk(emb, QUERY_VEC, TOPK, NUM_CENTROIDS, nprobe=1,
                          cents=cents, cells=cells)),
        ("p2", S.ivf_topk(emb, QUERY_VEC, TOPK, NUM_CENTROIDS, nprobe=2,
                          cents=cents, cells=cells)),
        ("pq", PQ.pq_adc_topk(emb, QUERY_VEC, TOPK, DIM, books=books)),
        ("ivfadc", PQ.ivfadc_topk(emb, QUERY_VEC, TOPK, DIM,
                                  NUM_CENTROIDS, nprobe=2,
                                  cents=cents, cells=cells, books=books)),
    ):
        parts.append(
            top.withColumn("rank", F.row_number().over(w).cast("long"))
            .select(
                F.lit(tag).alias("part"), "rank", "vec_id", "score"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "q_embed_ann_lsh",
    oracle=f"""
    WITH {S.duckdb_bucket_cte(DIM)},
    q AS (
      SELECT e.embedding AS qe, b.bucket AS qbucket
      FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
      WHERE e.vec_id = {QUERY_VEC}),
    s AS (
      SELECT e.vec_id, {V.duckdb_cosine('e.embedding', 'qe', DIM)} AS score
      FROM embeddings e
      JOIN buckets b ON e.vec_id = b.vec_id
      CROSS JOIN q
      WHERE b.bucket = q.qbucket)
    SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS BIGINT) AS rank,
           vec_id, score
    FROM s
    ORDER BY score DESC, vec_id
    LIMIT {TOPK}
    """,
)
def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed ANN top-k — the 100 TB scale path
    (bucket prune → exact rerank).  *Recall* is probabilistic (bounded
    vs the brute-force baseline in tests/test_llm_ops.py), but since
    round 2 the bucketing itself is exact integer arithmetic
    (quantized components × integer planes — order-independent int64
    sums), so the index + search result is fully oracle-verified: the
    round-1 rows-only check is gone."""
    top = S.lsh_bucketed_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_VEC, TOPK, DIM
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "score"
    )
