"""Multimodal binary-column queries.

``q_multimodal_binary`` proves the binary plumbing end-to-end with full
oracle parity (payload bytes, lengths, sha256 digests agree across
engines).  The decode/feature path (Python seam) is ``q_multimodal_features``
— rows-only, since the fake codec is engine-side by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.queries import query
from mapreduce_framework_for_mergesort_spark.sources import multimodal as M


@query(
    "q_multimodal_binary",
    oracle="""
    SELECT doc_id,
           'text' AS modality,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + metadata: length and content digest
    computed JVM-side over the bytes."""
    b = M.binarize_documents(load_table(spark, sf_dir, "documents"))
    return b.select(
        "doc_id",
        "modality",
        F.col("meta_n_bytes").alias("n_bytes"),
        F.sha2(F.col("payload"), 256).alias("digest"),
    )


@query("q_multimodal_features")  # rows-only: Python decode seam
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode → fixed-width feature arrays."""
    b = M.binarize_documents(load_table(spark, sf_dir, "documents"))
    return M.extract_features(b)


@query(
    "q_multimodal_frames",
    oracle=f"""
    SELECT doc_id,
           CAST((((strlen(text) + {M.FRAME_BYTES - 1}) // {M.FRAME_BYTES}) + 1) // 2
                AS BIGINT) AS n_frames,
           CAST(least(strlen(text), {M.FRAME_BYTES}) AS BIGINT) AS first_frame_bytes
    FROM documents
    WHERE strlen(text) > 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out, then a per-doc reduction the oracle can
    derive in closed form from payload length (every 2nd 64-byte frame):
    the mapInPandas 1→N plumbing is exercised for real, and its row
    arithmetic is still exactly verified."""
    b = M.binarize_documents(load_table(spark, sf_dir, "documents"))
    frames = M.sample_frames(b, every_n=2)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max(
            F.when(F.col("frame_idx") == 0, F.col("frame_n_bytes"))
        ).alias("first_frame_bytes"),
    )
