"""End-to-end training-data curation: the composition a corpus owner
actually runs, built from the engine's operators in their 100 TB shapes.

    raw documents
      → per-doc features (ONE codegen projection: quality + language)
      → filter (quality floor, language allowlist)
      → near-dedup (MinHash/LSH candidates → connected components →
        one deterministic survivor per cluster)
      → content-hash train/val/test split

Each stage is the scale-correct form established elsewhere in the repo:
the feature pass is a single scan with zero Python; dedup never
compares all pairs (LSH-blocked, cluster state sized by the candidate
graph); the split is a pure function of doc_id so reruns and engines
agree row-for-row.  No stage collects data to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import hashing as H
from mapreduce_framework_for_mergesort_spark.operators import dedup as D
from mapreduce_framework_for_mergesort_spark.operators import sampling
from mapreduce_framework_for_mergesort_spark.operators.text import (
    LANG_STOPWORDS,
    PUNCT_CLASS,
    _hits,
)


def with_curation_features(documents: DataFrame) -> DataFrame:
    """Append ``quality`` and ``pred_lang`` to the document rows in one
    whole-stage-codegen projection (the same expressions
    ``operators/text.py`` uses, composed column-wise so the pipeline
    pays ONE scan — joining the per-doc feature tables back on doc_id
    would shuffle the corpus twice for no reason)."""
    toks = H.spark_tokens("text")
    n_tokens = f"size({toks})"
    punct = (
        f"(char_length(text) - "
        f"char_length(regexp_replace(text, '{PUNCT_CLASS}', '')))"
    )
    stop_hits = _hits(toks, LANG_STOPWORDS["en"])
    langs = list(LANG_STOPWORDS)
    hits = {lang: _hits(toks, words) for lang, words in LANG_STOPWORDS.items()}
    branches = []
    for lang in langs:
        cond = " AND ".join(
            f"({hits[lang]}) >= ({hits[other]})"
            for other in langs
            if other != lang
        )
        branches.append(f"WHEN {cond} THEN '{lang}'")
    pred = f"CASE {' '.join(branches)} ELSE 'und' END"
    quality = (
        f"0.4 * least(CAST({n_tokens} AS DOUBLE) / 64.0, CAST(1 AS DOUBLE)) "
        f"+ 0.3 * (CAST(1 AS DOUBLE) - CAST({punct} AS DOUBLE) / char_length(text)) "
        f"+ 0.3 * least(4.0 * CAST({stop_hits} AS DOUBLE) / {n_tokens}, CAST(1 AS DOUBLE))"
    )
    return documents.withColumns(
        {"quality": F.expr(quality), "pred_lang": F.expr(pred)}
    )


def curate_documents(
    documents: DataFrame,
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    splits: sampling.Weights = sampling.DEFAULT_SPLITS,
    redact: bool = True,
) -> DataFrame:
    """The full curation pipeline → surviving documents with a ``split``
    column (original columns preserved; features dropped after the
    filter so the dedup/split stages don't carry them through shuffles).

    Redaction runs FIRST (before features and dedup) so documents that
    differ only in embedded PII become exact duplicates and collapse,
    and no PII influences quality/language scores or ships in any
    output row.
    """
    from mapreduce_framework_for_mergesort_spark.operators.text import (
        redact_pii,
    )

    if redact:
        documents = redact_pii(documents)
    kept = (
        with_curation_features(documents)
        .where(
            (F.col("quality") >= min_quality)
            & F.col("pred_lang").isin(*langs)
        )
        .drop("quality", "pred_lang")
    )
    return sampling.hash_split(D.near_dedup_documents(kept), "doc_id", splits)
