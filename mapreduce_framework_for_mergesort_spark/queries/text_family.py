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
    # sum_tokens counts SCRIPT-AWARE tokens (round 12 — the shared
    # tokenizer segments unsegmented scripts on both engines);
    # sum_token_chars counts non-whitespace CHARS, which segmentation
    # does not change
    oracle=rf"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(len({H.duckdb_tokens('text')})) AS BIGINT) AS sum_tokens,
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
_NT = rf"len({H.duckdb_tokens('text')})"


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


from mapreduce_framework_for_mergesort_spark.operators import langid as L  # noqa: E402

#: Multilingual fixture sentences (composed for this repo): the
#: documents table is ASCII-only with synthetic lang labels, so the
#: CJK/Cyrillic/Thai classifier paths get their oracle coverage from
#: a per-doc_id synthesized column — the url_rfc_raw discipline.  The
#: last branch is deliberately MIXED (English + Han): the script
#: stage wins by design.
ML_SENTENCES: tuple[tuple[str, str], ...] = (
    ("zh", "我们的数据系统每天都在快速增长"),
    ("ja", "これは日本語のテキストです。データを読んで書きます"),
    ("ko", "한국어 문장은 띄어쓰기를 사용합니다"),
    ("th", "ระบบข้อมูลของเราเติบโตอย่างรวดเร็ว"),
    ("en", "the people who build the system must think about the work and the way it is done"),
    ("de", "die menschen, die das system bauen, müssen über die arbeit nachdenken und wie sie gemacht wird"),
    ("es", "las personas que construyen el sistema deben pensar en el trabajo y en cómo se hace"),
    ("fr", "les personnes qui construisent le système doivent réfléchir à la manière dont le travail est fait"),
    ("ru", "люди, которые строят систему, должны думать о том, как делается работа"),
    ("und", "12345 67890 24680 13579"),
    ("zh", "mixed page 混合内容测试 with english words"),
)


def _ml_text_sql(engine: str) -> str:
    """The synthesized multilingual column, same construction on both
    engines (a trailing doc_id-derived number keeps contents distinct
    without touching any letter trigram — digit grams are excluded at
    profile-train time)."""
    cast = "STRING" if engine == "spark" else "VARCHAR"
    whens = " ".join(
        f"WHEN {i} THEN '{s}'" for i, (_, s) in enumerate(ML_SENTENCES)
    )
    return (
        f"(CASE doc_id % {len(ML_SENTENCES)} {whens} END"
        f" || ' ' || CAST(doc_id % 97 AS {cast}))"
    )


def _ml_expected_sql() -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{lang}'"
        for i, (lang, _) in enumerate(ML_SENTENCES)
    )
    return f"CASE doc_id % {len(ML_SENTENCES)} {whens} END"


@query(
    "q_lang_id",
    oracle=f"""
    WITH mlb AS (
      SELECT doc_id, lang AS labeled_lang, text,
             {_ml_text_sql('duckdb')} AS __ml,
             {_ml_expected_sql()} AS ml_expected
      FROM documents),
    p1 AS ({L.duckdb_pred_query(
        table='mlb',
        text_col='text',
        extra_cols='doc_id, labeled_lang, text, __ml, ml_expected',
    )}),
    p2 AS ({L.duckdb_pred_query(
        table='p1',
        text_col='__ml',
        extra_cols='doc_id, labeled_lang, text, ml_expected, '
                   'pred AS pred_lang',
    )})
    SELECT doc_id, labeled_lang, pred_lang,
           {H.duckdb_fingerprint("text")} AS fingerprint,
           ml_expected, pred AS pred_ml
    FROM p2
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID + content fingerprint in one projection (round-1
    ``q_fingerprint`` consolidated here — both per-doc classifier-shape
    columns over the same scan).

    Round 12: ``pred_lang`` is the two-stage char-n-gram classifier
    (``operators/langid.py`` — script detection + learned trigram
    profiles), and the ``ml_expected``/``pred_ml`` pair runs the SAME
    classifier over a synthesized multilingual column so the zh / ja /
    ko / th / ru / mixed paths are oracle-pinned on a corpus that is
    otherwise ASCII (the accuracy itself — pred_ml == ml_expected on
    every row — is pinned in tests/test_llm_ops.py).

    Round 13: ``pred_ml`` runs through the SAME Arrow kernel as
    ``pred_lang`` (``langid.lang_pred_arrow`` — pinned equal to the
    codegen expression in tests/test_langid.py) instead of the
    interpreted trigram ``let``: the synthesized column is evaluated
    per DOCUMENT row (no per-content collapse applies — its value
    varies with doc_id), and the kernel's in-task memo amortizes the
    ~1.5 K distinct sentences.  Measured 1.13 → 0.81 s at sf0.1 and
    2.57 → 1.02 s at ×10, identical results."""
    docs = load_table(spark, sf_dir, "documents")
    base = T.lang_id(docs, with_fingerprint=True).select(
        "doc_id", "labeled_lang", "pred_lang", "fingerprint"
    )
    return base.withColumns(
        {
            "ml_expected": F.expr(_ml_expected_sql()),
            "pred_ml": L.lang_pred_arrow(F.expr(_ml_text_sql("spark"))),
        }
    )


@query(
    "q_tfidf_top_terms",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, unnest({H.duckdb_tokens('text')}) AS term
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
