"""Text analysis operators (north-star extension; reference has none).

Everything is per-row JVM expression work (regex, higher-order array
functions) — zero Python in the hot path, embarrassingly parallel, no
shuffle except the explicit per-lang aggregation.  Ratios and scores are
single-expression double math, which is IEEE-deterministic cross-engine
(only *aggregated* double sums are order-dependent — those go through
DECIMAL or integers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.functions import hashing as H

# Tiny per-language stopword lists for the n-gram/stopword-hit heuristic.
# Chosen for determinism, not linguistic quality — the language-ID
# contract is "same text → same label", replicated exactly in the oracle.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ein", "nicht"),
    "es": ("el", "la", "de", "los", "que", "y"),
    "fr": ("le", "la", "les", "et", "des", "une"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}
# The characters COUNTED as punctuation: ``len(text) - len(text with
# this class removed)`` is the punctuation count.  (Rounds 1-2 shipped
# the negated class here, which silently made ``punct_ratio`` the
# NON-punctuation ratio and inverted the quality score's punctuation
# term — caught in round-3 review once the score became a load-bearing
# curation filter.  The oracle replicated the same inversion, so
# correctness rows stayed green while the semantics were wrong.)
PUNCT_CLASS = r"[.,!?;:]"


def _tokens() -> Column:
    return F.expr(H.spark_tokens("text"))


def _hits(toks: str, words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({toks}, t -> t IN ({in_list})))"


def text_feature_exprs(text_col: str = "text") -> dict[str, str]:
    """SINGLE source of the per-doc text-feature SQL sub-expressions
    (``toks``/``n_tokens``/``punct``/``stop_hits``/``quality``) shared
    by ``quality_scores``, ``doc_profile``, and
    ``pipelines.with_curation_features`` — the round-1 punctuation
    inversion survived precisely because this formula was hand-copied
    at every site and had to be found everywhere at once."""
    toks = H.spark_tokens(text_col)
    n_tokens = f"size({toks})"
    punct = (
        f"(char_length({text_col}) - "
        f"char_length(regexp_replace({text_col}, '{PUNCT_CLASS}', '')))"
    )
    stop_hits = _hits(toks, LANG_STOPWORDS["en"])
    # try_divide, not '/': under ANSI mode a zero-length or
    # zero-token document (empty/whitespace-only text — present in
    # real corpora and the NULL-bearing parity fixture) would ERROR
    # the whole scan, while DuckDB's division yields NULL; try_divide
    # reproduces DuckDB's NULL exactly, so quality is NULL for empty
    # text and 0.6 for whitespace-only text on BOTH engines (least()
    # skips NULLs identically in both).  A NULL quality fails any
    # `quality >= threshold` filter — degenerate docs drop out of
    # curation, which is the wanted behavior.
    quality = (
        f"0.4 * least(CAST({n_tokens} AS DOUBLE) / 64.0, CAST(1 AS DOUBLE)) "
        f"+ 0.3 * (CAST(1 AS DOUBLE) - try_divide(CAST({punct} AS DOUBLE), char_length({text_col}))) "
        f"+ 0.3 * least(try_divide(4.0 * CAST({stop_hits} AS DOUBLE), {n_tokens}), CAST(1 AS DOUBLE))"
    )
    dup_token_frac = (
        f"CASE WHEN {n_tokens} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"CAST(1 AS DOUBLE) - "
        f"CAST(size(array_distinct({toks})) AS DOUBLE) / {n_tokens} END"
    )
    return {
        "toks": toks,
        "n_tokens": n_tokens,
        "punct": punct,
        "stop_hits": stop_hits,
        "quality": quality,
        "dup_token_frac": dup_token_frac,
    }


def token_counts(documents: DataFrame) -> DataFrame:
    """Per-doc token stats: whitespace tokens + a BPE-ish subword proxy
    (alnum runs + punctuation singletons)."""
    toks = H.spark_tokens("text")
    bpe = r"regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r])', 1)"
    return documents.select(
        "doc_id",
        F.expr(f"size({toks})").cast("long").alias("n_tokens"),
        F.expr(f"size({bpe})").cast("long").alias("n_subwords"),
        F.length("text").cast("long").alias("n_chars_actual"),
    )


def text_stats_by_lang(documents: DataFrame) -> DataFrame:
    """Corpus stats per language label: doc/char/token totals (all
    integer-exact — no float aggregation)."""
    toks = H.spark_tokens("text")
    return (
        documents.select(
            "lang",
            F.expr(f"size({toks})").alias("__nt"),
            F.length(F.regexp_replace("text", r"[ \t\n\f\r]+", "")).alias("__tc"),
            F.col("n_chars"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("__nt").cast("long").alias("sum_tokens"),
            F.sum("__tc").cast("long").alias("sum_token_chars"),
        )
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length saturation, low
    punctuation density, stopword presence (fluency proxy).  Fixed
    expression tree of per-row double ops — deterministic cross-engine."""
    e = text_feature_exprs()
    return documents.select(
        "doc_id",
        F.expr(e["n_tokens"]).cast("long").alias("n_tokens"),
        # try_divide: NULL on empty/zero-token text, matching DuckDB's
        # x/0 (ANSI '/' errors — round-6 NULL-bearing-corpus audit)
        F.expr(
            f"try_divide(CAST({e['punct']} AS DOUBLE), char_length(text))"
        ).alias("punct_ratio"),
        F.expr(
            f"try_divide(CAST({e['stop_hits']} AS DOUBLE), {e['n_tokens']})"
        ).alias("stopword_ratio"),
        F.expr(e["quality"]).alias("quality"),
    )


def lang_id(
    documents: DataFrame,
    with_fingerprint: bool = False,
    strategy: str = "arrow",
) -> DataFrame:
    """Two-stage language ID (round 12, ``operators/langid.py``):
    script detection for the script-determined languages (kana → ja,
    hangul → ko, Thai → th, Han → zh — in that order, since Japanese
    text contains Han) and LEARNED char-trigram profiles
    (Cavnar–Trenkle over the packaged seed corpus) for the Latin- and
    Cyrillic-script languages; zero evidence → 'und'.  One codegen
    expression per row — the nested lets bind lower(text) and the
    score array exactly once (HOF eval has no CSE).  Replaces the
    round-1 stopword-hit argmax the round-11 verdict ranked as the
    biggest honest gap (every CJK page classified 'und').

    ``with_fingerprint=True`` appends the winnowing-style content
    fingerprint (min rolling hash over char 8-grams, Arrow kernel) in
    the same projection — classify + fingerprint share one scan.

    Classification and fingerprint are pure functions of the text, so
    both run once per distinct content (``per_content``); the labeled
    ``lang`` column rides the document side of the join.

    ``strategy``: ``"arrow"`` (default — the round-12 A/B winner,
    1.7× over the codegen ``let`` on the real fixture; the memoized
    kernel ``langid.lang_pred_arrow``) or ``"codegen"`` (the
    zero-Python expression the DuckDB oracle replicates).  Pinned
    equal in tests/test_langid.py."""
    from mapreduce_framework_for_mergesort_spark.operators import langid as L

    if strategy == "arrow":
        pred_col = L.lang_pred_arrow("text")
    elif strategy == "codegen":
        pred_col = F.expr(L.spark_pred_expr("text"))
    else:
        raise ValueError(f"unknown lang_id strategy {strategy!r}")

    def compute(reps: DataFrame) -> DataFrame:
        cols = ["__th", pred_col.alias("pred_lang")]
        if with_fingerprint:
            cols.append(
                H.fingerprint_udf()(F.col("text")).alias("fingerprint")
            )
        return reps.select(*cols)

    out_cols = [
        F.col("doc_id"),
        F.col("lang").alias("labeled_lang"),
        F.col("pred_lang"),
    ]
    if with_fingerprint:
        out_cols.append(F.col("fingerprint"))
    return per_content(documents, compute).select(*out_cols)


def per_content(documents: DataFrame, compute) -> DataFrame:
    """Compute text-pure columns once per DISTINCT content and join
    them back onto every document row (round 6 — the replica collapse
    the dedup kernels pioneered, factored for the text operators):
    ``compute`` receives the distinct ``(__th, text)`` frame and must
    return ``(__th, *computed)`` — one row per content, or several
    (e.g. per-term rows): the join back to doc ids fans them out.  The
    result is ``documents``' rows (all original columns) plus the
    computed columns.

    Scale shape: per-document text analysis is a pure function of the
    text, so on a replica-heavy corpus — the corpus a curation
    pipeline actually sees — the expression/kernel cost divides by the
    duplication factor; the price is one distinct exchange (one text
    per distinct content) and one hash join on md5(text).  Identical
    results by construction, so oracles are unchanged."""
    hashed = documents.withColumn(
        "__th", F.md5(F.col("text").cast("binary"))
    )
    reps = documents.select(
        F.md5(F.col("text").cast("binary")).alias("__th"), "text"
    ).dropDuplicates(["__th"])
    # null-safe equi-join: md5(NULL) is NULL, and a plain inner join
    # would silently DROP every NULL-text document (caught by the
    # NULL-bearing-corpus parity test); <=> keeps them as their own
    # content group, whose computed columns are the expressions'
    # natural NULLs — matching what the uncollapsed projection (and
    # DuckDB) produce for NULL text.
    comp = compute(reps).withColumnRenamed("__th", "__th_r")
    return hashed.join(
        comp, F.col("__th").eqNullSafe(F.col("__th_r"))
    ).drop("__th", "__th_r")


# --- round-13 optimization: per-content Arrow kernels -----------------------
# Pure-Python replicas of the doc_profile / tfidf per-content expression
# batteries, applied as ONE pandas_udf behind the per_content collapse —
# the exact shape that won for lang-id's classifier and the URL family
# (one boundary crossing amortized over the whole column family beats
# the interpreted/codegen regex battery).  Every replica is pinned
# equal to the SQL form in tests/test_llm_ops.py; the DuckDB oracles
# are untouched, so the driver's value-level hash check is the gate.

import re as _re2

_BPE_RE_PY = _re2.compile(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\f\r]")
_NUM_RE_PY = _re2.compile(r"[0-9]+")
_CAP_RE_PY = _re2.compile(r"[A-Z][a-z]+")
_URL_RE_PY = _re2.compile(r"https?://")
_PUNCT_RE_PY = _re2.compile(r"[.,!?;:]")
_EN_STOPS = frozenset(LANG_STOPWORDS["en"])


def _doc_profile_py(s: str | None) -> tuple:
    """One document's doc_profile row (the kernel body) — field-for-field
    the SQL battery: same tokenizer (``hashing.tokenize``), same
    try_divide→None semantics, same least()-skips-NULL quality algebra,
    same IEEE double op order (left-assoc sum of the three terms)."""
    if s is None:
        return (None,) * 10
    toks = H.tokenize(s)
    nt = len(toks)
    nchars = len(s)
    n_sub = len(_BPE_RE_PY.findall(s))
    punct = len(_PUNCT_RE_PY.findall(s))
    stop_hits = sum(1 for t in toks if t in _EN_STOPS)
    punct_ratio = punct / nchars if nchars > 0 else None
    stop_ratio = stop_hits / nt if nt > 0 else None
    t1 = 0.4 * min(nt / 64.0, 1.0)
    t3 = 0.3 * (min((4.0 * stop_hits) / nt, 1.0) if nt > 0 else 1.0)
    quality = (
        None
        if punct_ratio is None
        else (t1 + 0.3 * (1.0 - punct_ratio)) + t3
    )
    m = _NUM_RE_PY.search(s)
    first_num = m.group(0) if m else ""
    return (
        nt,
        n_sub,
        nchars,
        punct_ratio,
        stop_ratio,
        quality,
        first_num,
        _NUM_RE_PY.sub("#", s),
        len(_CAP_RE_PY.findall(s)),
        _URL_RE_PY.search(s) is not None,
    )


_DOC_PROFILE_SCHEMA = (
    "n_tokens long, n_subwords long, n_chars_actual long, "
    "punct_ratio double, stopword_ratio double, quality double, "
    "first_num string, no_digits string, n_capitalized long, "
    "has_url boolean"
)
_DOC_PROFILE_FIELDS = [f.split()[0] for f in _DOC_PROFILE_SCHEMA.split(", ")]


def doc_profile_arrow(text) -> Column:
    """The whole doc_profile column family as ONE Arrow struct kernel
    (round 13; the url_family_arrow shape).  Pinned equal to the
    codegen battery in tests/test_llm_ops.py."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def kernel(s):
        rows = [_doc_profile_py(v) for v in s]
        return pd.DataFrame(rows, columns=_DOC_PROFILE_FIELDS)

    kernel.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    return pandas_udf(kernel, _DOC_PROFILE_SCHEMA)(text)


def term_counts_arrow(text) -> Column:
    """Per-document (term, tf) multiset as ONE Arrow kernel returning
    ``array<struct<term,tf>>`` (round 13) — replaces tfidf's
    explode-tokens → groupBy(content, term) count, which paid a corpus-
    token-volume exchange; the Counter runs inside the row, so the only
    remaining shuffles in tf-idf are the per_content distinct and the
    df aggregation the algorithm fundamentally needs.  Exact: Counter
    over the pinned ``hashing.tokenize`` == the SQL count-by-group."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from collections import Counter

    def kernel(s):
        out = []
        for v in s:
            if v is None:
                out.append([])
            else:
                out.append(
                    [
                        {"term": t, "tf": c}
                        for t, c in Counter(H.tokenize(v)).items()
                    ]
                )
        return pd.Series(out)

    kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(kernel, "array<struct<term string, tf long>>")(text)


def doc_profile(documents: DataFrame, strategy: str = "arrow") -> DataFrame:
    """Per-document profile: token/subword/char counts, punctuation and
    stopword ratios, the heuristic quality score, and the regex scalar
    bundle (extract / replace-all / extract-all count / match test) —
    ONE whole-stage-codegen projection over one scan; at 100 TB this is
    the single-pass per-doc featurizer a filter pipeline wants, not five
    passes.  Patterns stay in the POSIX-compatible subset where Java
    regex and DuckDB's RE2 agree; both return '' for a no-match
    extract.

    ``strategy``: ``"arrow"`` (default — round-13 A/B winner: the
    whole ten-column family as ONE struct kernel behind the
    per-content collapse, one Python crossing per distinct content;
    numbers in OPTIMIZATION_r13.md) or ``"codegen"`` (the zero-Python
    battery the DuckDB oracle replicates).  Pinned equal in
    tests/test_llm_ops.py."""
    e = text_feature_exprs()
    n_tokens = e["n_tokens"]
    bpe = r"regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\f\\r])', 1)"
    if strategy == "arrow":

        def compute_arrow(reps: DataFrame) -> DataFrame:
            return reps.select(
                "__th", doc_profile_arrow(F.col("text")).alias("__p")
            ).select("__th", "__p.*")

        return per_content(documents, compute_arrow).select(
            "doc_id", *_DOC_PROFILE_FIELDS
        )
    if strategy != "codegen":
        raise ValueError(f"unknown doc_profile strategy {strategy!r}")

    # every output column is a pure function of the text, so the whole
    # projection runs once per distinct content (per_content)
    def compute(reps: DataFrame) -> DataFrame:
        return reps.select(
            "__th",
            F.expr(n_tokens).cast("long").alias("n_tokens"),
            F.expr(f"size({bpe})").cast("long").alias("n_subwords"),
            F.length("text").cast("long").alias("n_chars_actual"),
            # try_divide: empty/zero-token text → NULL ratios, exactly
            # DuckDB's x/0 (ANSI '/' would error the scan — round 6
            # NULL-bearing-corpus audit)
            F.expr(
                f"try_divide(CAST({e['punct']} AS DOUBLE), char_length(text))"
            ).alias("punct_ratio"),
            F.expr(
                f"try_divide(CAST({e['stop_hits']} AS DOUBLE), {n_tokens})"
            ).alias("stopword_ratio"),
            F.expr(e["quality"]).alias("quality"),
            F.regexp_extract("text", "([0-9]+)", 1).alias("first_num"),
            F.regexp_replace("text", "[0-9]+", "#").alias("no_digits"),
            F.expr(r"size(regexp_extract_all(text, '([A-Z][a-z]+)', 1))")
            .cast("long")
            .alias("n_capitalized"),
            F.col("text").rlike("https?://").alias("has_url"),
        )

    return per_content(documents, compute).select(
        "doc_id",
        "n_tokens",
        "n_subwords",
        "n_chars_actual",
        "punct_ratio",
        "stopword_ratio",
        "quality",
        "first_num",
        "no_digits",
        "n_capitalized",
        "has_url",
    )


def repetition_profile(documents: DataFrame) -> DataFrame:
    """Per-document repetition metrics in the style of the Gopher/
    MassiveText quality rules (Rae et al. 2021, table A1): heavily
    repetitive documents (boilerplate, keyword stuffing, generation
    loops) are low-value training data even when their token counts and
    punctuation look fine, so repetition is its own filter axis.

    * ``n_tokens``          — total tokens;
    * ``dup_token_frac``    — 1 − distinct/total tokens (the fraction
                              of the doc that is repeats of earlier
                              words); 0.0 for empty docs;
    * ``top_bigram``        — the most frequent token bigram
                              (lexicographically smallest on count
                              ties; NULL when < 2 tokens);
    * ``top_bigram_frac``   — that bigram's share of all bigrams (the
                              'most common 2-gram mass' rule).

    Shapes: token/distinct counts are one codegen projection; the
    bigram mode needs a per-(doc, bigram) count — explode + two
    aggregations, both map-side-combinable, partitioned by doc_id
    (never global).  All counts are exact integers; the one division
    per metric is a deterministic double op, so the operator carries a
    DuckDB-parity test."""
    from mapreduce_framework_for_mergesort_spark.operators.materialize import (
        materialize,
    )

    e = text_feature_exprs()
    toks = e["toks"]
    base = documents.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        # bigram count derived arithmetically so the final projection
        # never touches the array — carrying __bigrams through the join
        # below would shuffle a corpus-sized payload just for size()
        F.expr(f"greatest(size({toks}) - 1, 0)").alias("n_bigrams"),
        F.expr(e["dup_token_frac"]).alias("dup_token_frac"),
        # let-bound: the tokenizer runs ONCE per doc — referenced bare
        # inside the transform lambda it would re-run per bigram,
        # turning the projection O(n_tokens²) in regex evals (the trap
        # functions/hashing.let documents)
        F.expr(
            H.let(
                toks,
                "ts",
                "CASE WHEN size(ts) >= 2 THEN "
                "transform(sequence(1, size(ts) - 1), "
                "i -> concat_ws(' ', element_at(ts, i), "
                "element_at(ts, i + 1))) "
                "ELSE CAST(array() AS ARRAY<STRING>) END",
            )
        ).alias("__bigrams"),
    )
    # base feeds BOTH the bigram-counts branch and the final join —
    # un-materialized, the tokenize+bigram projection (the operator's
    # dominant per-row cost) would re-execute over the whole corpus
    # for each branch (round-4+ review; same pattern as
    # lsh_candidate_pairs' band-index materialization).  The stored
    # blocks do carry the __bigrams arrays (~2 strings per token) —
    # a deliberate storage-for-compute trade; they are still never
    # SHUFFLED (the join below reads the dropped-column projection)
    base = materialize(base)
    counts = (
        base.select(
            "doc_id", F.explode("__bigrams").alias("bigram")
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("bigram")
    )
    top = (
        counts.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "doc_id",
            F.col("bigram").alias("top_bigram"),
            F.col("cnt").alias("__top_cnt"),
        )
    )
    return (
        base.drop("__bigrams")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            "top_bigram",
            F.expr(
                "CASE WHEN n_bigrams > 0 THEN "
                "CAST(__top_cnt AS DOUBLE) / n_bigrams "
                "ELSE CAST(0 AS DOUBLE) END"
            ).alias("top_bigram_frac"),
        )
    )


CHUNK_TOKENS = 128
CHUNK_OVERLAP = 32


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap_tokens: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Sliding-window token chunking — the context-window op every
    RAG/embedding/pretraining pipeline needs: each document becomes
    overlapping windows of ``chunk_tokens`` whitespace tokens with
    ``overlap_tokens`` shared between neighbors (stride =
    chunk − overlap), the last window short if the doc doesn't divide
    evenly; empty documents produce zero chunks.

    Output: (doc_id, chunk_idx, chunk_text, n_chunk_tokens).

    100 TB shape: ONE codegen projection — tokenize once (let-bound),
    chunk-count arithmetic, a ``transform(sequence(...))`` building
    each window via ``slice`` + ``concat_ws``, then a single
    ``posexplode``.  Zero Python, zero shuffle, zero joins; output
    rows ≈ input tokens · chunk/(chunk−overlap), linear by
    construction.  All the arithmetic is non-negative integer math
    (``ceil`` spelled as ``(x + stride − 1) div stride`` on values
    clamped ≥ 0, because Spark's ``div`` truncates while DuckDB's
    ``//`` floors — they only agree without negatives), so
    ``duckdb_chunk_sql`` replicates it exactly.
    """
    if overlap_tokens < 0 or chunk_tokens <= overlap_tokens:
        raise ValueError(
            f"need 0 <= overlap ({overlap_tokens}) < chunk "
            f"({chunk_tokens}) for a positive stride"
        )
    stride = chunk_tokens - overlap_tokens
    toks = H.spark_tokens("text")
    # the sequence bound floors at 1 — Spark's sequence(1, 0) yields
    # the DESCENDING [1, 0], not an empty array (caught by the
    # empty-doc edge test: two phantom ''-chunks, one of them from a
    # negative slice start) — and the filter drops the one empty
    # window an empty document would otherwise produce
    chunks = H.let(
        toks,
        "ts",
        f"""filter(
              transform(
                sequence(1, greatest(
                  CASE WHEN size(ts) = 0 THEN 0
                       ELSE 1 + (greatest(size(ts) - {chunk_tokens}, 0)
                                 + {stride - 1}) div {stride} END, 1)),
                i -> named_struct(
                  'chunk_text',
                  concat_ws(' ', slice(ts, (i - 1) * {stride} + 1,
                                       {chunk_tokens})),
                  'n_chunk_tokens',
                  least({chunk_tokens},
                        size(ts) - (i - 1) * {stride}))),
              c -> c.n_chunk_tokens >= 1)""",
    )
    return documents.select(
        "doc_id", F.posexplode(F.expr(chunks)).alias("chunk_idx", "__c")
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("__c.chunk_text").alias("chunk_text"),
        F.col("__c.n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
    )


def duckdb_chunk_sql(
    table: str = "documents",
    chunk_tokens: int = CHUNK_TOKENS,
    overlap_tokens: int = CHUNK_OVERLAP,
) -> str:
    """Oracle replica of ``chunk_documents`` (same clamped integer
    ceil, same 1-based slices — DuckDB ``list_slice`` takes an
    inclusive END where Spark ``slice`` takes a LENGTH)."""
    if overlap_tokens < 0 or chunk_tokens <= overlap_tokens:
        raise ValueError("need 0 <= overlap < chunk")
    stride = chunk_tokens - overlap_tokens
    return f"""
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS chunk_idx,
           array_to_string(
             list_slice(ts, (i - 1) * {stride} + 1,
                        (i - 1) * {stride} + {chunk_tokens}), ' ')
             AS chunk_text,
           CAST(least({chunk_tokens}, len(ts) - (i - 1) * {stride})
                AS BIGINT) AS n_chunk_tokens
    FROM (
      SELECT doc_id, ts,
             unnest(range(1, 1 + CASE WHEN len(ts) = 0 THEN 0
                          ELSE 1 + (greatest(len(ts) - {chunk_tokens}, 0)
                                    + {stride - 1}) // {stride} END)) AS i
      FROM (SELECT doc_id, {H.duckdb_tokens('text')} AS ts FROM {table})
    )
    """


def tfidf_top_terms(
    documents: DataFrame, top_n: int = 3, strategy: str = "collapsed"
) -> DataFrame:
    """Per-document top-n terms by tf-idf (linear-idf variant:
    ``tf · N / df`` — no logarithm, so the score is exact integer
    arithmetic surfaced as one deterministic double division; ``log``
    is libm territory where engines can differ in the last ulp).

    Pipeline: explode tokens → (doc, term) counts (one shuffle, map-side
    combined) → document frequency per term (second small shuffle) →
    join + per-doc top-n window.  The tf↔df join is deliberately NOT
    force-broadcast: the df table's cardinality is the corpus VOCABULARY
    (Heaps-law unbounded — IDs/typos/URLs), and ``F.broadcast`` would
    bypass the size threshold and collect it to the driver at 100 TB.
    Left to Spark, small vocabularies auto-broadcast under
    ``autoBroadcastJoinThreshold``/AQE and large ones degrade safely to
    a shuffle join on ``term`` (both sides already partitioned by term
    from their aggregations).  The window partitions by doc_id — never
    global.
    """
    toks = H.spark_tokens("text")

    # the (term, tf) multiset is a pure function of the text, so the
    # explode + count shuffle runs over DISTINCT contents
    # (per_content's compute may return several rows per content — the
    # join back to doc ids fans them out); document frequency and the
    # per-doc window below are computed AFTER the join-back, so df
    # still counts DOCUMENTS, replicas included
    #
    # strategy="codegen" (default — round-13 A/B LOSER was arrow:
    # the per-content Counter kernel emits array<struct<term,tf>> in
    # one crossing, removing the groupBy(content, term) exchange, but
    # measured 1.27 vs 1.28 s at x1 and 1.82 vs 2.23 s at x10 — the
    # Python-built struct arrays cost more to serialize than the
    # map-side-combined count shuffle they replace.  "arrow" stays as
    # the documented losing variant, pinned equal in
    # tests/test_llm_ops.py.
    if strategy == "arrow":

        def compute(reps: DataFrame) -> DataFrame:
            return reps.select(
                "__th", F.explode(term_counts_arrow(F.col("text"))).alias("kv")
            ).select("__th", "kv.term", "kv.tf")

    elif strategy == "codegen":

        def compute(reps: DataFrame) -> DataFrame:
            return (
                reps.select("__th", F.explode(F.expr(toks)).alias("term"))
                .groupBy("__th", "term")
                .agg(F.count(F.lit(1)).alias("tf"))
            )

    elif strategy == "collapsed":
        # Round 13: run the ENTIRE tfidf pipeline at distinct-content
        # grain and fan out to doc_ids once, at the end.  Every
        # downstream quantity is content-determined: tf per (content,
        # term) by definition; df = Σ over contents containing the
        # term of that content's replica count (exactly "number of
        # documents containing the term", replicas included); tfidf is
        # arithmetic on those; and the per-doc top-n window's order
        # (tfidf DESC, term) is a deterministic total order WITHIN a
        # content (terms are unique per content), so every replica of
        # a content gets the identical rn sequence — the window can
        # rank once per content and the fan-out copies the rows.  On a
        # replica-heavy corpus this removes the document-grain sort
        # (the plan's largest shuffle+sort) and shrinks the df/join
        # stages by the duplication factor; on an all-distinct corpus
        # it degenerates to the same volumes plus one hash join.
        # PRECONDITION (same key contract pack_documents documents):
        # doc_id is unique — two different texts sharing a doc_id
        # would pool into one per-document window in the old spelling
        # but rank separately here; no table in the schema can
        # produce that.  Pinned row-identical to the per-document
        # spelling in tests/test_llm_ops.py (replica-bearing corpus);
        # the DuckDB oracle is unchanged.
        from pyspark.sql import Window

        hashed = documents.withColumn(
            "__th", F.md5(F.col("text").cast("binary"))
        )
        reps = documents.select(
            F.md5(F.col("text").cast("binary")).alias("__th"), "text"
        ).dropDuplicates(["__th"])
        repl = hashed.groupBy("__th").agg(F.count(F.lit(1)).alias("__n"))
        tf_d = (
            reps.select("__th", F.explode(F.expr(toks)).alias("term"))
            .groupBy("__th", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
        )
        df_ = (
            tf_d.join(repl, "__th")
            .groupBy("term")
            .agg(F.sum("__n").alias("df"))
        )
        n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
        scored_d = (
            tf_d.join(df_, "term")
            .crossJoin(F.broadcast(n_docs))
            .withColumn(
                "tfidf",
                (F.col("tf") * F.col("n_docs")).cast("double")
                / F.col("df"),
            )
        )
        w = Window.partitionBy("__th").orderBy(F.col("tfidf").desc(), "term")
        top_d = scored_d.withColumn(
            "rn", F.row_number().over(w).cast("long")
        ).where(F.col("rn") <= top_n)
        return hashed.join(top_d, "__th").select(
            "doc_id", "term", "tf", "df", "tfidf", "rn"
        )
    else:
        raise ValueError(f"unknown tfidf strategy {strategy!r}")

    tf = per_content(documents, compute).select("doc_id", "term", "tf")
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= top_n)
        .select("doc_id", "term", "tf", "df", "tfidf", "rn")
    )


BM25_QUERY_TERMS = ("merge", "sort", "spark")  # default demo query
BM25_TOP_K = 10


def bm25_score_expr(
    tf: str, dl: str, df: str, n_docs: str, avgdl: str
) -> str:
    """One query term's BM25 contribution as a SQL string, SHARED by
    the Spark operator and the DuckDB oracle (both engines evaluate
    the literal same expression tree over the same doubles — same ops,
    same order, same bits; the text_feature_exprs discipline).

    k1 = 1.2 and b = 0.75 (the textbook defaults) are baked into the
    literals: ``k1+1 = 2.2``, ``1-b = 0.25``.  The idf is the repo's
    LINEAR surrogate ``(N+1)/(df+0.5)`` — no logarithm (libm territory
    where engines differ in the last ulp — see tfidf_top_terms), always
    positive (classic BM25's ``ln((N-df+.5)/(df+.5))`` goes negative
    for terms in over half the corpus), and monotone decreasing in df,
    which is all the ranking needs."""
    idf = (
        f"(CAST({n_docs} + 1 AS DOUBLE) / "
        f"(CAST({df} AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    )
    norm = (
        f"(CAST({tf} AS DOUBLE) + CAST(1.2 AS DOUBLE) * "
        f"(CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * "
        f"(CAST({dl} AS DOUBLE) / {avgdl})))"
    )
    return f"({idf} * (CAST({tf} AS DOUBLE) * CAST(2.2 AS DOUBLE)) / {norm})"


def bm25_avgdl_expr(sum_dl: str = "sum_dl", n_docs: str = "n_docs") -> str:
    """Average document length as one double division (shared string,
    same reasoning as ``bm25_score_expr``)."""
    return f"(CAST({sum_dl} AS DOUBLE) / CAST({n_docs} AS DOUBLE))"


def _check_bm25_terms(query_terms: tuple[str, ...]) -> None:
    """Terms are interpolated into single-quoted SQL literals on BOTH
    engines, so reject loudly what would break or silently never
    match (round-4+ review): quotes/backslashes corrupt the literal,
    and a term containing whitespace cannot equal any token the
    whitespace tokenizer emits — it would score 0 forever."""
    import re as _re

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    for q in query_terms:
        if not q or _re.search(r"[\s'\\]", q):
            raise ValueError(
                f"invalid BM25 query term {q!r}: terms must be "
                "non-empty and contain no whitespace, quotes, or "
                "backslashes (they are whitespace-tokenizer tokens "
                "interpolated into SQL literals)"
            )


#: Input-bytes cutoff for bm25's per-content collapse (round 13, the
#: STRIP_ARROW_THRESHOLD_BYTES shape): below it the md5 + distinct +
#: fan-out overhead beats the saving (measured 0.70 → 1.02 s at ×1,
#: 0.6 MB docs); above it the per-doc tokenize battery dominates
#: (4.05 → 1.23 s at ×10, 5.8 MB).  At corpus scale always collapsed.
BM25_COLLAPSE_THRESHOLD_BYTES = 4 << 20


def bm25_topk(
    documents: DataFrame,
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    top_k: int = BM25_TOP_K,
    strategy: str = "auto",
) -> DataFrame:
    """Top-k documents for a fixed term query by BM25 (Robertson &
    Walker '94 term saturation + length normalization; linear idf per
    ``bm25_score_expr``) — the retrieval-ranking shape of a
    training-data pipeline (query-relevance filtering, eval-set
    mining).

    100 TB shape: per-doc term frequencies come from ``size(filter(
    tokens, ...))`` over the SAME one-scan projection that feeds the
    corpus statistics — no token explode, no (doc, term) shuffle at
    all, unlike the tf-idf pipeline.  The corpus stats (N, Σdl, one df
    per query term) are ONE aggregated row, broadcast back over the
    per-doc table; scoring is pure codegen arithmetic and the top-k is
    ``TakeOrderedAndProject`` (never a global sort).  The per-doc
    projection is materialized once so the stats pass and the scoring
    pass can't re-scan the corpus.

    Output: (doc_id, dl, hits, bm25, rank) — rank 1..top_k by
    (bm25 DESC, doc_id), decided by a window over the ≤ top_k
    already-limited rows (bounded, never corpus-wide).
    """
    from pyspark.sql import Window

    from mapreduce_framework_for_mergesort_spark.operators.materialize import (
        materialize,
    )

    _check_bm25_terms(query_terms)
    if strategy == "auto":
        from mapreduce_framework_for_mergesort_spark.operators.materialize import (
            input_bytes,
        )

        strategy = (
            "collapsed"
            if (input_bytes(documents) or 0) >= BM25_COLLAPSE_THRESHOLD_BYTES
            else "per_doc"
        )
    # coalesce NULL text to '': Spark's legacy sizeOfNull makes
    # size(NULL) = -1, which would corrupt dl (and sum_dl/avgdl) while
    # DuckDB's len(NULL) is NULL — coalescing on BOTH engines keeps a
    # NULL-text doc as dl=0 with every tf=0, cross-engine identical
    toks = H.spark_tokens("coalesce(text, '')")
    idx = range(len(query_terms))
    tf_cols = [
        F.expr(f"size(filter({toks}, t -> t = '{q}'))")
        .cast("long")
        .alias(f"tf_{i}")
        for i, q in enumerate(query_terms)
    ]
    avgdl = bm25_avgdl_expr()
    score = " + ".join(
        bm25_score_expr(f"tf_{i}", "dl", f"df_{i}", "n_docs", avgdl)
        for i in idx
    )
    hits = " + ".join(f"tf_{i}" for i in idx)
    if strategy == "collapsed":
        # Round 13: dl and every tf_i are pure functions of the text,
        # so the tokenize+filter battery runs once per DISTINCT
        # (NULL-coalesced) content; the corpus stats are replica-count-
        # weighted integer sums over that grain — EXACTLY the per-doc
        # sums (n_docs = Σn, sum_dl = Σ dl·n, df_i = Σ n where
        # tf_i > 0; integer arithmetic, no regrouping error) — and the
        # scoring arithmetic runs per content.  Only the final top-k
        # needs doc_ids: one narrow join fans (content → bm25) back to
        # (doc_id) rows for the same TakeOrderedAndProject.  NULL and
        # '' text share a group deliberately: both produce the
        # identical all-zero row.  Measured 0.94 → ~0.9 s at ×1 and
        # 4.37 → ~1 s at ×10; pinned row-identical to the per-document
        # spelling in tests/test_llm_ops.py.
        keyed = documents.select(
            "doc_id",
            F.md5(F.coalesce(F.col("text"), F.lit("")).cast("binary")).alias(
                "__th"
            ),
        )
        reps = (
            documents.select(
                F.md5(
                    F.coalesce(F.col("text"), F.lit("")).cast("binary")
                ).alias("__th"),
                "text",
            )
            .dropDuplicates(["__th"])
        )
        per_d = materialize(
            reps.select(
                "__th",
                F.expr(f"size({toks})").cast("long").alias("dl"),
                *tf_cols,
            )
        )
        repl = keyed.groupBy("__th").agg(F.count(F.lit(1)).alias("__n"))
        both = per_d.join(repl, "__th")
        stats = both.agg(
            F.sum("__n").alias("n_docs"),
            F.sum(F.col("dl") * F.col("__n")).alias("sum_dl"),
            *[
                F.sum(
                    F.when(F.col(f"tf_{i}") > 0, F.col("__n")).otherwise(
                        F.lit(0)
                    )
                ).alias(f"df_{i}")
                for i in idx
            ],
        )
        scored_d = per_d.crossJoin(F.broadcast(stats)).select(
            "__th",
            "dl",
            F.expr(hits).cast("long").alias("hits"),
            F.expr(score).alias("bm25"),
        )
        top = (
            keyed.join(scored_d, "__th")
            .select("doc_id", "dl", "hits", "bm25")
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(top_k)
        )
        w = Window.orderBy(F.desc("bm25"), "doc_id")
        return top.withColumn("rank", F.row_number().over(w).cast("long"))
    if strategy != "per_doc":
        raise ValueError(f"unknown bm25 strategy {strategy!r}")
    per = materialize(
        documents.select(
            "doc_id",
            F.expr(f"size({toks})").cast("long").alias("dl"),
            *tf_cols,
        )
    )
    stats = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in idx
        ],
    )
    top = (
        per.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "dl",
            F.expr(hits).cast("long").alias("hits"),
            F.expr(score).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def duckdb_bm25_cte(
    query_terms: tuple[str, ...] = BM25_QUERY_TERMS,
    top_k: int = BM25_TOP_K,
    table: str = "documents",
) -> str:
    """DuckDB replica of ``bm25_topk`` (CTE chain ending in ``bmtop``):
    same per-doc tf/dl projection, same one-row stats, same shared
    score-expression STRING — the double math is literally identical
    text on both engines."""
    _check_bm25_terms(query_terms)
    idx = range(len(query_terms))
    tfs = ",\n             ".join(
        f"len(list_filter(toks, t -> t = '{q}')) AS tf_{i}"
        for i, q in enumerate(query_terms)
    )
    dfs = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in idx
    )
    avgdl = bm25_avgdl_expr()
    score = " + ".join(
        bm25_score_expr(f"tf_{i}", "dl", f"df_{i}", "n_docs", avgdl)
        for i in idx
    )
    hits = " + ".join(f"tf_{i}" for i in idx)
    return f"""
    tokq AS (
      SELECT doc_id, {H.duckdb_tokens("coalesce(text, '')")} AS toks
      FROM {table}),
    perq AS (
      SELECT doc_id, len(toks) AS dl,
             {tfs}
      FROM tokq),
    statq AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
             {dfs}
      FROM perq),
    bmtop AS (
      SELECT doc_id, dl, CAST({hits} AS BIGINT) AS hits, {score} AS bm25,
             row_number() OVER (ORDER BY {score} DESC, doc_id) AS rank
      FROM perq CROSS JOIN statq
      QUALIFY rank <= {top_k})
    """


# PII patterns kept in the POSIX subset where Java regex and RE2 agree
# (same discipline as doc_profile's bundle): email, international-ish
# phone, 16-digit card, US SSN.  Order matters — longer/more-specific
# patterns run first so a card number isn't half-eaten by the phone rule.
#
# Digit-run patterns are wrapped in BOUNDARY GUARDS at apply time (see
# ``_guarded`` below): a bare ``[0-9]{3}-[0-9]{2}-[0-9]{4}`` also
# matches *inside* a longer digit run ('91234-5678-9012-34567' would
# half-redact — round-3 advisory), so the guarded form requires a
# non-digit (or string edge) on both sides.  Lookarounds are the
# textbook fix but RE2 (the DuckDB oracle engine) has none, so the
# guards are capture-group alternations ``(^|[^0-9])pat([^0-9]|$)``
# with the boundary chars restored by ``$1``/``$3`` in the replacement
# — valid and identical in Java regex and RE2.
#
# Residual coverage limits (deliberate): bare 10-digit runs are NOT
# redacted by DEFAULT (indistinguishable from ids/order numbers — a
# rule that eats every 10-digit integer destroys non-PII data; the
# opt-in ``aggressive=True`` mode adds a [2-9]-leading 10-digit rule
# for corpora where the recall is worth that cost); international
# formats beyond the +N-NNN-NNN(N)-NNNN shape and letters-for-digits
# vanity numbers are out of scope.  Email keeps no digit guards: its
# own char classes are its boundaries.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IBAN-ish (round 5): 2-letter country + 2 check digits + body,
    # contiguous or in the conventional spaced groups of 4.  MUST run
    # before the card rule — a spaced IBAN's interior can contain four
    # 4-digit groups the card rule would half-eat.  Guarded on ALNUM
    # boundaries (not just digits): a longer alphanumeric run may not
    # be half-redacted.  (?:...) keeps the no-capturing-group contract
    # _guarded relies on.
    (r"[A-Z]{2}[0-9]{2}(?: [A-Z0-9]{4}){3,7}(?: [A-Z0-9]{1,4})?", "<IBAN>"),
    (r"[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}", "<IBAN>"),
    (r"[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}", "<CARD>"),
    (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    # 4-group international form first, then the common US 3-group
    # forms (dash, space, and parenthesized area code).  SSN can't
    # collide with the 3-group dash form: {3}-{2}-{4} and {3}-{3}-{4}
    # differ in the middle-run length at every alignment.
    (r"\+?[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{4}", "<PHONE>"),
    (r"[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    (r"[0-9]{3} [0-9]{3} [0-9]{4}", "<PHONE>"),
    (r"\([0-9]{3}\) [0-9]{3}-[0-9]{4}", "<PHONE>"),
)

# Opt-in shapes appended by ``aggressive=True``: the bare 10-digit US
# phone (area codes start [2-9]), digit-guarded so ids of 11+ digits
# stay whole.  Runs last: every separator-bearing form above is more
# specific.
PII_AGGRESSIVE_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[2-9][0-9]{9}", "<PHONE>"),
)

_NO_GUARD = frozenset({"<EMAIL>"})
# Guard character class per placeholder (default: digit boundaries).
# IBAN bodies are alphanumeric, so their guards must exclude letters
# too — a digit guard would let 'XDE44...' match after the X.
_GUARD_CLASS = {"<IBAN>": "A-Za-z0-9"}


def _guarded(pat: str, repl: str) -> tuple[str, str]:
    """Wrap a digit-run pattern in RE2-compatible boundary guards
    (identity for patterns whose own classes already bound them)."""
    if repl in _NO_GUARD:
        return pat, repl
    cls = _GUARD_CLASS.get(repl, "0-9")
    # the pattern rides in CAPTURING group 2 so the guards are always
    # groups 1 and 3 (no pattern contains its own capturing group —
    # IBAN's repetitions are (?:...) — so the numbering holds)
    return rf"(^|[^{cls}])({pat})([^{cls}]|$)", rf"$1{repl}$3"


def redact_pii(
    documents: DataFrame, col: str = "text", aggressive: bool = False
) -> DataFrame:
    """Replace common PII shapes in ``col`` with typed placeholders —
    the curation stage that must run before training text ships.  Pure
    chained ``regexp_replace`` (one codegen projection, zero Python,
    no shuffle); patterns are deterministic cross-engine so the
    operator is exactly oracle-able with DuckDB ``regexp_replace(...,
    'g')`` (replacement syntax translates mechanically, ``$n`` → ``\\n``).

    Each guarded pattern is applied TWICE: a guard consumes the
    boundary character, so of two PII matches separated by exactly one
    non-digit char ('111-22-3333,444-55-6666') the first replace can
    only catch one — the second pass catches the neighbor.  Guards
    consume at most one boundary char per match, so two passes reach
    the fixpoint for any such chain (alternating separators included);
    pinned by the idempotence test.

    ``aggressive=True`` appends ``PII_AGGRESSIVE_PATTERNS`` (bare
    10-digit phones) — opt-in because it also eats 10-digit ids; see
    the pattern-table comment for the tradeoff."""
    out = F.col(col)
    pats = PII_PATTERNS + (
        PII_AGGRESSIVE_PATTERNS if aggressive else ()
    )
    for pat, repl in pats:
        gpat, grepl = _guarded(pat, repl)
        passes = 1 if (gpat, grepl) == (pat, repl) else 2
        for _ in range(passes):
            out = F.regexp_replace(out, gpat, grepl)
    return documents.withColumn(col, out)


def duckdb_redact_sql(col: str = "text", aggressive: bool = False) -> str:
    """The oracle half of ``redact_pii``: the identical chain of
    replaces as a DuckDB expression (RE2 runs the same guarded
    patterns; only the replacement backref syntax differs, ``$n`` →
    ``\\n``).  Pinned equal to the Spark operator row-for-row in
    tests, which is what makes the 'exactly oracle-able' claim real."""
    out = col
    pats = PII_PATTERNS + (
        PII_AGGRESSIVE_PATTERNS if aggressive else ()
    )
    for pat, repl in pats:
        gpat, grepl = _guarded(pat, repl)
        passes = 1 if (gpat, grepl) == (pat, repl) else 2
        grepl = grepl.replace("$1", r"\1").replace("$3", r"\3")
        for _ in range(passes):
            out = f"regexp_replace({out}, '{gpat}', '{grepl}', 'g')"
    return out


def fingerprints(documents: DataFrame) -> DataFrame:
    """Winnowing-style content fingerprint: min Karp-Rabin rolling hash
    over char 8-grams (robust to global reordering), via the exact-int64
    Arrow kernel (``functions/hashing.py`` — the SQL expression form is
    the canonical definition it is pinned to)."""
    return documents.select(
        "doc_id",
        H.fingerprint_udf()(F.col("text")).alias("fingerprint"),
    )
