"""Text-analysis queries: corpus stats, per-doc profile (token counts +
quality score + regex bundle), language ID + fingerprint, tf-idf —
oracles mirror the exact expression trees.  (Registry consolidated to
the driver's 50-key budget: round-1 q_token_count / q_quality_score /
q_regex_funcs are q_text_doc_profile; q_fingerprint lives in q_lang_id.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
           CAST(SUM(len(regexp_extract_all(text, '[^ \t\n\f\r]+'))) AS BIGINT) AS sum_tokens,
           CAST(SUM(length(regexp_replace(text, '[ \t\n\f\r]+', '', 'g'))) AS BIGINT)
             AS sum_token_chars
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.text_stats_by_lang(load_table(spark, sf_dir, "documents"))


def _duckdb_hits(words) -> str:
    toks = H.duckdb_tokens("text")
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({toks}, t -> t IN ({in_list})))"


# Mirrors operators/text.PUNCT_CLASS (non-negated: the chars counted
# AS punctuation) — both engines must flip together.
_PUNCT = r"(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))"
_NT = r"len(regexp_extract_all(text, '[^ \t\n\f\r]+'))"


@query(
    "q_text_doc_profile",
    oracle=rf"""
    SELECT doc_id,
           CAST({_NT} AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r]'))
                AS BIGINT) AS n_subwords,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST({_PUNCT} AS DOUBLE) / length(text) AS punct_ratio,
           CAST({_duckdb_hits(T.LANG_STOPWORDS['en'])} AS DOUBLE) / {_NT}
             AS stopword_ratio,
           0.4 * least(CAST({_NT} AS DOUBLE) / 64.0, CAST(1 AS DOUBLE))
           + 0.3 * (CAST(1 AS DOUBLE) - CAST({_PUNCT} AS DOUBLE) / length(text))
           + 0.3 * least(4.0 * CAST({_duckdb_hits(T.LANG_STOPWORDS['en'])} AS DOUBLE) / {_NT},
                         CAST(1 AS DOUBLE))
             AS quality,
           regexp_extract(text, '[0-9]+') AS first_num,
           regexp_replace(text, '[0-9]+', '#', 'g') AS no_digits,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
             AS n_capitalized,
           regexp_matches(text, 'https?://') AS has_url
    FROM documents
    """,
)
def q_text_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-document profile: token counting, quality
    scoring, and the regex scalar bundle (round-1 ``q_token_count`` +
    ``q_quality_score`` + ``q_regex_funcs``, consolidated to the
    driver's 50-key budget — they were three projections over the same
    scan)."""
    return T.doc_profile(load_table(spark, sf_dir, "documents"))


def _duckdb_lang_case() -> str:
    langs = list(T.LANG_STOPWORDS)
    # Zero-evidence guard first: without it the first language wins the
    # all-zero tie and ELSE 'und' is unreachable (mirrors operators/text).
    zero = " AND ".join(f"h_{lang} = 0" for lang in langs)
    branches = [f"WHEN {zero} THEN 'und'"]
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
      SELECT doc_id, lang AS labeled_lang, text,
             {', '.join(f'{_duckdb_hits(w)} AS h_{lang}' for lang, w in T.LANG_STOPWORDS.items())}
      FROM documents)
    SELECT doc_id, labeled_lang, {_duckdb_lang_case()} AS pred_lang,
           {H.duckdb_fingerprint("text")} AS fingerprint
    FROM h
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + content fingerprint in one projection (round-1
    ``q_fingerprint`` consolidated here — both per-doc classifier-shape
    columns over the same scan)."""
    return T.lang_id(
        load_table(spark, sf_dir, "documents"), with_fingerprint=True
    )


@query(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[^ \t\n\f\r]+')) AS term
      FROM documents),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dfr AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / dfr.df AS tfidf
      FROM tf JOIN dfr USING (term) CROSS JOIN n),
    """
    + T.duckdb_bm25_cte()
    + f"""
    SELECT 'tfidf' AS part, doc_id, term, tf, df, tfidf,
           CAST(rn AS BIGINT) AS rn
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
          FROM scored) t
    WHERE rn <= 3
    UNION ALL
    SELECT 'bm25' AS part, doc_id,
           '{" ".join(T.BM25_QUERY_TERMS)}' AS term,
           dl AS tf, hits AS df, bm25 AS tfidf,
           CAST(rank AS BIGINT) AS rn
    FROM bmtop
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction + retrieval ranking as a tagged union:

    * ``tfidf`` — per-doc top-3 terms by linear-idf tf-idf (explode →
      two aggregations → term join), exact cross-engine;
    * ``bm25``  — corpus top-10 documents for the fixed query
      ``BM25_QUERY_TERMS`` by BM25 with length normalization and term
      saturation (one scan + one broadcast stats row, zero token
      shuffle — see ``bm25_topk``).  Column reuse in the union:
      term = the query string, tf = document length, df = total
      query-term hits, tfidf = the BM25 score, rn = rank.  The score
      expression STRING is shared with the oracle, so the double math
      is bit-identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    tfidf = T.tfidf_top_terms(docs, 3).select(
        F.lit("tfidf").alias("part"),
        "doc_id", "term", "tf", "df", "tfidf", "rn",
    )
    bm = T.bm25_topk(docs).select(
        F.lit("bm25").alias("part"),
        "doc_id",
        F.lit(" ".join(T.BM25_QUERY_TERMS)).alias("term"),
        F.col("dl").alias("tf"),
        F.col("hits").alias("df"),
        F.col("bm25").alias("tfidf"),
        F.col("rank").alias("rn"),
    )
    return tfidf.unionByName(bm)
