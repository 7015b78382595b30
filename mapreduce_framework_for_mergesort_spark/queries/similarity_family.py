"""Similarity-search queries over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import vector as V
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import similarity as S
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


@query("q_embed_ann_lsh")  # rows-only: ANN recall is probabilistic by design
def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucketed ANN top-k — the 100 TB scale path
    (bucket prune → exact rerank).  Recall vs. the brute-force baseline
    is asserted in tests/test_similarity.py; no SQL oracle because the
    result is legitimately approximate."""
    return S.lsh_bucketed_topk(
        load_table(spark, sf_dir, "embeddings"), QUERY_VEC, TOPK, DIM
    )
