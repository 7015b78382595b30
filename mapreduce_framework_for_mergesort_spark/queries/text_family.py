"""Text-analysis queries: corpus stats, token counting, quality scoring,
language ID, fingerprinting — oracles mirror the exact expression trees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_framework_for_mergesort_spark.functions import hashing as H
from mapreduce_framework_for_mergesort_spark.io import load_table
from mapreduce_framework_for_mergesort_spark.operators import text as T
from mapreduce_framework_for_mergesort_spark.queries import query


@query(
    "q_text_stats",
    oracle=r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS sum_tokens,
           CAST(SUM(length(regexp_replace(text, '\s+', '', 'g'))) AS BIGINT)
             AS sum_token_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.text_stats_by_lang(load_table(spark, sf_dir, "documents"))


@query(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))
                AS BIGINT) AS n_subwords,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_counts(load_table(spark, sf_dir, "documents"))


def _duckdb_hits(words) -> str:
    toks = H.duckdb_tokens("text")
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({in_list})))"


_PUNCT = r"(length(text) - length(regexp_replace(text, '[^.,!?;:]', '', 'g')))"
_NT = r"len(regexp_extract_all(text, '\S+'))"


@query(
    "q_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST({_NT} AS BIGINT) AS n_tokens,
           CAST({_PUNCT} AS DOUBLE) / length(text) AS punct_ratio,
           CAST({_duckdb_hits(T.LANG_STOPWORDS['en'])} AS DOUBLE) / {_NT}
             AS stopword_ratio,
           0.4 * least(CAST({_NT} AS DOUBLE) / 64.0, CAST(1 AS DOUBLE))
           + 0.3 * (CAST(1 AS DOUBLE) - CAST({_PUNCT} AS DOUBLE) / length(text))
           + 0.3 * least(4.0 * CAST({_duckdb_hits(T.LANG_STOPWORDS['en'])} AS DOUBLE) / {_NT},
                         CAST(1 AS DOUBLE))
             AS quality
    FROM documents
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_scores(load_table(spark, sf_dir, "documents"))


def _duckdb_lang_case() -> str:
    langs = list(T.LANG_STOPWORDS)
    branches = []
    for lang in langs:
        cond = " AND ".join(
            f"h_{lang} >= h_{other}" for other in langs if other != lang
        )
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return f"CASE {' '.join(branches)} ELSE 'und' END"


@query(
    "q_lang_id",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang AS labeled_lang,
             {', '.join(f'{_duckdb_hits(w)} AS h_{lang}' for lang, w in T.LANG_STOPWORDS.items())}
      FROM documents)
    SELECT doc_id, labeled_lang, {_duckdb_lang_case()} AS pred_lang FROM h
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.lang_id(load_table(spark, sf_dir, "documents"))


@query(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfr AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / dfr.df AS tfidf
      FROM tf JOIN dfr USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
          FROM scored) t
    WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc top-3 terms by (linear-idf) tf-idf — the keyword-extraction
    shape of a training-data pipeline, exact cross-engine."""
    return T.tfidf_top_terms(load_table(spark, sf_dir, "documents"), 3)


@query(
    "q_regex_funcs",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '[0-9]+') AS first_num,
           regexp_replace(text, '[0-9]+', '#', 'g') AS no_digits,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
             AS n_capitalized,
           regexp_matches(text, 'https?://') AS has_url
    FROM documents
    """,
)
def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar bundle (extract / replace-all / extract-all count /
    match test) — JVM-side, whole-stage-codegen'd.  Patterns stay within
    the POSIX-compatible subset where Java regex and DuckDB's RE2 agree;
    both engines return '' for a no-match extract."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_num"),
        F.regexp_replace("text", "[0-9]+", "#").alias("no_digits"),
        F.expr(r"size(regexp_extract_all(text, '([A-Z][a-z]+)', 1))")
        .cast("long")
        .alias("n_capitalized"),
        F.col("text").rlike("https?://").alias("has_url"),
    )


@query(
    "q_fingerprint",
    oracle=(
        "SELECT doc_id, "
        + H.duckdb_fingerprint("text")
        + " AS fingerprint FROM documents"
    ),
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.fingerprints(load_table(spark, sf_dir, "documents"))
