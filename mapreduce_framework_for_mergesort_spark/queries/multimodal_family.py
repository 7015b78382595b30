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
