"""Deterministic hashing primitives for dedup/fingerprinting operators.

Every primitive is built twice (or three times) from the same
constants: a canonical Spark SQL expression, a DuckDB SQL snippet for
the oracle, and — on the hot paths — an Arrow/NumPy kernel pinned
row-for-row to the SQL form in tests.  All arithmetic that feeds a
signature is exact int64 (order-independent), so every formulation
agrees bit-for-bit with zero engine-specific numerics.

MinHash family (Carter–Wegman affine, since round 2): ONE base hash per
shingle — the first 8 md5 hex chars as an int64 (``md5_32``) — then
``sig_k = min over shingles of (a_k · h + b_k) mod (2^31 − 1)`` with
(a_k, b_k) derived deterministically from md5 of the index k.  One md5
per shingle total; the k signatures are pure integer math on top.
Bands of ``BAND_ROWS`` signatures collapse to one md5 of the joined
decimal strings.  (Round 1 used per-k salted-md5 hex-string mins —
k md5 calls per shingle; replaced for cost, same API.)

Scale note: all of this is per-row array work over token/shingle lists —
embarrassingly parallel, no shuffle.  The only shuffle in any dedup
pipeline built on these is the final group/join on signature or band,
which is exactly the shuffle the algorithm requires.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# --- shared constants (single source of truth for both engines) -----------

NUM_MINHASHES = 12
BAND_ROWS = 3  # signatures per LSH band
NUM_BANDS = NUM_MINHASHES // BAND_ROWS
# 48 bits = ALL FOUR bits of the first 12 md5 hex digits (round 4: the
# original 16-bit signature — top bit of 16 digits — made the banded
# hamming join quadratic at corpus scale: 50 K docs over a 2^16 space
# is ~760 docs per 4-bit band bucket, and the 10× sweep measured the
# pair tier at 841 s.  At 48 bits each 12-bit band has 4096 buckets, so
# only genuinely hamming-near docs collide and the tier is linear;
# SCALE_r04.json holds the before/after).  48, not 64: bit weights sum
# below 2^48, comfortably inside signed int64 on every engine.
SIMHASH_BITS = 48
SIMHASH_HEX_DIGITS = SIMHASH_BITS // 4
SHINGLE_N = 3  # word n-gram width


# --- let-binding combinator -------------------------------------------------
# Spark SQL has no LET, and two Catalyst behaviors conspire against naive
# factoring of expensive sub-expressions into withColumn steps:
#   1. CollapseProject inlines the factored column back into its consumers
#      (observed: regexp_extract_all appearing 7x in one physical plan);
#   2. any expression inlined *inside a higher-order-function lambda body*
#      is re-evaluated per array element at runtime.
# Wrapping the expensive expression in a one-element array and binding it
# through a transform lambda variable forces exactly-once evaluation: the
# HOF evaluates its input array once, and lambda-variable references are
# plain reads.  Measured 4.5x on the MinHash band pipeline at sf0.1.

def let(expr: str, var: str, body: str) -> str:
    """``let var = expr in body`` for Spark SQL expressions."""
    return f"transform(array({expr}), {var} -> {body})[0]"


# --- tokenization ----------------------------------------------------------
# The whitespace class is EXPLICIT, not '\s': the three regex engines in
# play disagree about '\s' at the margins — Java includes \x0B (VT), RE2
# does not, and Python's Unicode '\s' additionally eats \x1c-\x1f, NEL,
# NBSP, and every Unicode space.  Tokenizing 'a\x1cb' then yields one
# token in SQL and two in an Arrow kernel — silent signature drift
# between the engine and its oracle (round-3 review).  [ \t\n\f\r] is
# the intersection all three agree on, spelled identically everywhere.

# One logical class, three spellings (escaping layers differ): Spark
# SQL string literals consume one backslash layer before the Java regex
# sees the pattern (hence double), DuckDB strings pass backslashes
# through to RE2 untouched (hence single), and the kernels compile the
# Python-native form.  All three denote exactly [^ \t \n \f \r]+.
TOKEN_CLASS_SPARK = r"[^ \\t\\n\\f\\r]+"
TOKEN_CLASS_DUCKDB = r"[^ \t\n\f\r]+"

import re as _re

TOKEN_RE = _re.compile(r"[^ \t\n\f\r]+")  # the kernels' identical class

# --- script-aware segmentation (round 12) ----------------------------------
# Whitespace tokenization misreads every UNSEGMENTED script: Chinese /
# Japanese / Thai / Lao / Khmer / Myanmar write no spaces between
# words, so a whole line became one "token" — token counts read
# ~chars/line, shingle dedup saw one shingle per sentence, chunking
# emitted page-sized chunks (round-11 verdict, missing #1).  The fix
# is the standard character-level baseline for unsegmented scripts:
# every code point in these ranges becomes its own token, implemented
# as ONE pre-tokenize regexp_replace that spaces the characters out.
# The ranges are Unicode block data (public): Han (unified + ext A +
# compatibility), kana (hiragana, katakana, extensions, halfwidth),
# Thai, Lao, Myanmar, Khmer.  Hangul is NOT here — Korean is written
# WITH spaces, so whitespace tokenization is already right for it.
# ASCII and all space-delimited scripts hit the no-op path: the class
# matches nothing and the string passes through unchanged, which is
# what keeps every pre-round-12 pinned value stable.
#
# The class is built from code-point numbers into LITERAL characters,
# not regex \uXXXX escapes, because the three engines disagree on
# escape syntax (Java \uXXXX, RE2 \x{XXXX}) but all three agree on
# literal UTF-8 code points in a character class.
UNSEG_SCRIPT_RANGES: tuple[tuple[int, int], ...] = (
    (0x3400, 0x4DBF),  # CJK ext A
    (0x4E00, 0x9FFF),  # CJK unified
    (0xF900, 0xFAFF),  # CJK compatibility ideographs
    (0x3040, 0x309F),  # hiragana
    (0x30A0, 0x30FF),  # katakana
    (0x31F0, 0x31FF),  # katakana phonetic extensions
    (0xFF66, 0xFF9D),  # halfwidth katakana
    (0x0E00, 0x0E7F),  # Thai
    (0x0E80, 0x0EFF),  # Lao
    (0x1000, 0x109F),  # Myanmar
    (0x1780, 0x17FF),  # Khmer
)
UNSEG_SCRIPT_CLASS = (
    "["
    + "".join(f"{chr(a)}-{chr(b)}" for a, b in UNSEG_SCRIPT_RANGES)
    + "]"
)
_SEG_RE = _re.compile(f"({UNSEG_SCRIPT_CLASS})")


def tokenize(s: str) -> list[str]:
    """The kernels' tokenizer — identical semantics to the SQL
    spellings below (segment unsegmented scripts, then split on the
    explicit whitespace class)."""
    return TOKEN_RE.findall(_SEG_RE.sub(r" \1 ", s))


def spark_segmented(text_col: str) -> str:
    """``text_col`` with unsegmented-script characters spaced out —
    the shared pre-tokenize step (Java regex spelling)."""
    return (
        f"regexp_replace({text_col}, '({UNSEG_SCRIPT_CLASS})', ' $1 ')"
    )


def duckdb_segmented(text_col: str) -> str:
    """RE2 spelling of ``spark_segmented`` (backref ``\\1``, explicit
    global flag)."""
    return (
        f"regexp_replace({text_col}, '({UNSEG_SCRIPT_CLASS})', "
        f"' \\1 ', 'g')"
    )


def spark_tokens(text_col: str = "text") -> str:
    # explicit group: Spark's regexp_extract_all requires one.
    return (
        rf"regexp_extract_all({spark_segmented(text_col)}, "
        rf"'({TOKEN_CLASS_SPARK})', 1)"
    )


def duckdb_tokens(text_col: str = "text") -> str:
    return (
        rf"regexp_extract_all({duckdb_segmented(text_col)}, "
        rf"'{TOKEN_CLASS_DUCKDB}')"
    )


# --- word n-gram shingles --------------------------------------------------

def spark_shingles(toks: str, n: int = SHINGLE_N) -> str:
    # let-bound: ``toks`` is referenced n+2 times (twice in size(), n times
    # inside the per-shingle lambda) — without the binding the token
    # expression would re-run per shingle.
    parts = ", ".join(f"element_at(ts, i + {k})" for k in range(n))
    return let(
        toks,
        "ts",
        f"CASE WHEN size(ts) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size(ts) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END",
    )


def duckdb_shingles(toks: str, n: int = SHINGLE_N) -> str:
    parts = ", ".join(f"{toks}[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE [] END"
    )


# --- minhash signatures ----------------------------------------------------
# Carter–Wegman affine family over ONE base md5 per shingle:
#
#   h(s)   = first 8 hex chars of md5(s) as an integer   (< 2^32)
#   h_k(s) = (a_k · h(s) + b_k) mod P,   P = 2^31 − 1
#
# with (a_k, b_k) derived deterministically from md5 of the index (the
# hyperplane-constants trick).  a_k < P and h < 2^32, so every product
# is < 2^63: exact int64 in Spark SQL (pmod), DuckDB (%), and NumPy —
# the three implementations agree bit-for-bit.  Round 3 replaced the
# round-1 family h_k(s) = md5('<k>|' || s), which recomputed md5
# NUM_MINHASHES times per shingle — the dominant cost of the whole LSH
# pipeline (~12 interpreted md5+concat per shingle per doc); the affine
# family hashes each shingle ONCE and derives the rest with integer
# math, which also makes the signature pass NumPy-vectorizable
# (``band_structs_udf``).  Min runs over int64 signatures instead of
# hex strings; band values stay md5-of-decimal-strings (portable).

MINHASH_P = (1 << 31) - 1


def _mh_const(tag: str, k: int, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{tag}{k}".encode()).hexdigest()[:8], 16) % mod


MINHASH_AB = [
    (_mh_const("a", k, MINHASH_P - 1) + 1, _mh_const("b", k, MINHASH_P))
    for k in range(NUM_MINHASHES)
]


def spark_base_hash(s: str) -> str:
    return f"CAST(conv(substring(md5({s}), 1, 8), 16, 10) AS BIGINT)"


def duckdb_base_hash(s: str) -> str:
    return f"CAST('0x' || substring(md5({s}), 1, 8) AS BIGINT)"


# --- 48-bit gram hash -------------------------------------------------------
# The positional-gram tiers (dup_spans/strip_dup_spans) group and join a
# CORPUS-SIZED table on the gram key, so the key must be (a) an int64 —
# a 32-char md5 hex string quadruples shuffle bytes and makes every
# comparison a string compare (round-5 review: the suite's top cost
# center) — and (b) wide enough that hash equality ≈ gram equality:
# 32 bits (md5_32) collides at ~100 pairs per 10^6 distinct grams
# (birthday), each collision minting a FALSE duplicate span; 48 bits
# pushes that to ~2·10^-3 expected collisions at 10^6 and ~20 at 10^9 —
# negligible against the k-gram reformulation's own fringe-token
# resolution limit.  First 12 md5 hex chars < 2^48: exact int64 in all
# three engines.

GRAM_HEX_DIGITS = 12


def spark_gram_hash(s: str) -> str:
    return (
        f"CAST(conv(substring(md5({s}), 1, {GRAM_HEX_DIGITS}), 16, 10)"
        " AS BIGINT)"
    )


def duckdb_gram_hash(s: str) -> str:
    return (
        f"CAST('0x' || substring(md5({s}), 1, {GRAM_HEX_DIGITS}) AS BIGINT)"
    )


def py_gram_hash(s: str) -> int:
    """Kernel spelling of the same 48-bit gram hash (hex-identical md5
    across hashlib/JVM/DuckDB, same first-12-digit prefix)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:GRAM_HEX_DIGITS], 16)


def gram_rows_udf(k: int):
    """Arrow-batched positional k-gram pass: per document, the array of
    ``(pos, g)`` window rows (1-based token position, 48-bit gram hash)
    — the IDENTICAL definition as ``dedup.positional_ngrams_sql``, which
    it is pinned to row-for-row in tests.  The SQL form pays one
    interpreted concat+md5 per window inside a HOF lambda (HOFs never
    enter codegen); the kernel makes one Arrow pass with two memos:

    * window→hash — the duplicated material this pass exists to find is
      exactly the material that repeats, so hot boilerplate windows hash
      once per task (the simhash kernel's Zipf argument, one level up);
    * text→rows — byte-identical documents (the dominant duplication
      mode in replicated corpora and the 100× spot-check) skip
      tokenization entirely.

    Both memos are per-Arrow-batch (bounded by task input size, the
    same budget as the simhash/BPE memos)."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<struct<pos: int, g: long>>")
    def grams(text: pd.Series) -> pd.Series:
        doc_memo: dict[str, list] = {}
        win_memo: dict[str, int] = {}
        out = []
        for s in text:
            if s is None:
                # NULL text → no windows, matching the SQL spelling
                # (posexplode of a NULL/empty gram array yields no
                # rows) — and the kernel must not rely on the caller's
                # join null-filter inference to keep None out.
                out.append([])
                continue
            hit = doc_memo.get(s)
            if hit is None:
                toks = tokenize(s)
                hit = []
                if len(toks) >= k:
                    join = " ".join
                    md5 = hashlib.md5
                    get = win_memo.get
                    for i in range(len(toks) - k + 1):
                        w = join(toks[i : i + k])
                        g = get(w)
                        if g is None:
                            g = int(
                                md5(w.encode()).hexdigest()[
                                    :GRAM_HEX_DIGITS
                                ],
                                16,
                            )
                            win_memo[w] = g
                        hit.append((i + 1, g))
                doc_memo[s] = hit
            out.append(hit)
        return pd.Series(out)

    return grams


def spark_minhash(shingles: str, k: int) -> str:
    a, b = MINHASH_AB[k]
    return (
        f"array_min(transform({shingles}, s -> "
        f"pmod({a} * {spark_base_hash('s')} + {b}, {MINHASH_P})))"
    )


def duckdb_minhash(shingles: str, k: int) -> str:
    a, b = MINHASH_AB[k]
    return (
        f"list_min(list_transform({shingles}, s -> "
        f"({a} * {duckdb_base_hash('s')} + {b}) % {MINHASH_P}))"
    )


def spark_band_structs(shingles: str) -> str:
    """Full MinHash-LSH index expression: shingles → array of
    ``NUM_BANDS`` ``struct<band_id:int, band_val:string>`` in ONE pass.

    Canonical Spark SQL definition (the hot path is the Arrow kernel
    ``band_structs_udf``, pinned to this expression in tests).  The
    shingle list AND the per-shingle base hashes are let-bound, so the
    tokenize/shingle/md5 pipeline runs exactly once per document — each
    of the NUM_MINHASHES signature mins is then pure integer math over
    the bound hash list.  Docs with no shingles yield an empty array
    (nothing to collide on)."""

    def sig(k: int) -> str:
        a, b = MINHASH_AB[k]
        return (
            f"CAST(array_min(transform(hs, h -> "
            f"pmod({a} * h + {b}, {MINHASH_P}))) AS STRING)"
        )

    structs = ", ".join(
        "named_struct('band_id', CAST({} AS INT), 'band_val', "
        "md5(concat_ws('|', {})))".format(
            b_id, ", ".join(sig(k) for k in idxs)
        )
        for b_id, idxs in band_slices()
    )
    body = (
        f"CASE WHEN size(sh) > 0 THEN array({structs}) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<band_id: INT, band_val: STRING>>) END"
    )
    return let(
        shingles,
        "sh",
        let(f"transform(sh, s -> {spark_base_hash('s')})", "hs", body),
    )


def band_structs_udf(n: int = SHINGLE_N):
    """Arrow-batched LSH index build: per document, ONE md5 per shingle
    (Python hashlib — hex-identical to JVM/DuckDB md5), then all
    ``NUM_MINHASHES`` affine signatures in a single NumPy
    broadcast-multiply + min.  Replaces the interpreted Catalyst
    expression (~ms/doc) at ~µs-scale/doc; pinned to
    ``spark_band_structs`` row-for-row in tests."""
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf

    A = np.array([a for a, _ in MINHASH_AB], dtype=np.int64)[:, None]
    B = np.array([b for _, b in MINHASH_AB], dtype=np.int64)[:, None]
    slices = band_slices()

    @pandas_udf("array<struct<band_id: int, band_val: string>>")
    def bands(text: pd.Series) -> pd.Series:
        out = []
        for s in text:
            # None → no bands, like <n-token text (the SQL spelling's
            # NULL shingle array explodes to no rows either way)
            toks = tokenize(s) if s is not None else []
            if len(toks) < n:
                out.append([])
                continue
            # a set is fine: min() is invariant to duplicates/order
            sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            hs = np.array(
                [
                    int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    for g in sh
                ],
                dtype=np.int64,
            )
            sig = ((A * hs[None, :] + B) % MINHASH_P).min(axis=1)
            out.append(
                [
                    (
                        b_id,
                        hashlib.md5(
                            "|".join(str(int(sig[i])) for i in idxs).encode()
                        ).hexdigest(),
                    )
                    for b_id, idxs in slices
                ]
            )
        return pd.Series(out)

    return bands


def band_slices() -> list[tuple[int, list[int]]]:
    """[(band_id, [sig indexes])]."""
    return [
        (b, list(range(b * BAND_ROWS, (b + 1) * BAND_ROWS)))
        for b in range(NUM_BANDS)
    ]


def spark_band(sig_cols: list[str]) -> str:
    return f"md5(concat_ws('|', {', '.join(sig_cols)}))"


def duckdb_band(sig_cols: list[str]) -> str:
    return f"md5(concat_ws('|', {', '.join(sig_cols)}))"


# --- simhash ---------------------------------------------------------------
# 48-bit simhash: bit b is the majority vote over tokens of bit (b % 4)
# (MSB first) of md5 hex digit (b // 4 + 1).  Digit value is decoded via
# position in '0123456789abcdef' (md5 hex is lowercase on every engine;
# instr/strpos are 1-based, identical in Spark and DuckDB).  Ties
# (2*hi == n) vote 0.

_HEXPOS = "'0123456789abcdef'"


def _simhash_bits_sql(hi_of_bit, n_expr: str) -> list[str]:
    """The 48 per-bit CASE terms, shared by both engines: ``hi_of_bit(d,
    mask)`` renders the count-of-tokens-with-bit-set expression for hex
    digit ``d`` (1-based) and bit ``mask``."""
    bits = []
    for b in range(SIMHASH_BITS):
        d, mask = b // 4 + 1, 8 >> (b % 4)
        hi = hi_of_bit(d, mask)
        bits.append(
            f"(CASE WHEN 2 * {hi} > {n_expr} THEN "
            f"{1 << (SIMHASH_BITS - 1 - b)} ELSE 0 END)"
        )
    return bits


def spark_simhash(toks: str) -> str:
    # The per-token md5 list is referenced in every bit term — let-bound
    # so tokens are hashed exactly once per document.
    def hi(d: int, mask: int) -> str:
        return (
            f"size(filter(hs, h -> "
            f"((instr({_HEXPOS}, substring(h, {d}, 1)) - 1) & {mask}) > 0))"
        )

    bits = _simhash_bits_sql(hi, "size(hs)")
    return let(
        f"transform({toks}, t -> md5(t))",
        "hs",
        f"CAST({' + '.join(bits)} AS BIGINT)",
    )


def duckdb_simhash(toks: str) -> str:
    hashes = f"list_transform({toks}, t -> md5(t))"

    def hi(d: int, mask: int) -> str:
        return (
            f"len(list_filter({hashes}, h -> "
            f"((strpos({_HEXPOS}, substring(h, {d}, 1)) - 1) & {mask}) > 0))"
        )

    bits = _simhash_bits_sql(hi, f"len({toks})")
    return f"CAST({' + '.join(bits)} AS BIGINT)"


def simhash_udf():
    """Arrow-batched simhash with the IDENTICAL definition as
    ``spark_simhash`` (one md5 per token TYPE; majority vote over each
    of the 48 bits of the first 12 hex digits, ties vote 0).  The SQL
    expression makes SIMHASH_BITS interpreted passes over the per-token
    hash list; the kernel makes one and is pinned to the expression in
    tests.

    A per-task token→bit-row memo collapses repeated word types (the
    same Zipf argument as the BPE kernels): the 100× spot-check showed
    the per-occurrence md5 as this tier's per-byte floor, and most
    occurrences in real text are repeats of a few thousand types."""
    import hashlib

    from pyspark.sql.functions import pandas_udf

    weights = (1 << np.arange(SIMHASH_BITS - 1, -1, -1)).astype(np.int64)
    shifts = np.array([3, 2, 1, 0], dtype=np.uint8)

    @pandas_udf("long")
    def sim(text: pd.Series) -> pd.Series:
        memo: dict[str, np.ndarray] = {}
        out = np.zeros(len(text), dtype=np.int64)
        for ix, s in enumerate(text):
            if s is None:
                # NULL text → 0, matching BOTH SQL spellings: every
                # bit term's CASE compares against a NULL count and
                # falls through to its ELSE 0 (the same fall-through
                # test_fingerprint_kernel_survives_non_ascii_and_null
                # pins for the fingerprint) — and the kernel must not
                # rely on callers null-filtering its input.
                continue
            toks = tokenize(s)
            if not toks:
                continue  # no tokens → every vote fails → 0, like the SQL
            rows = np.empty((len(toks), SIMHASH_BITS), dtype=np.uint8)
            for j, t in enumerate(toks):
                b = memo.get(t)
                if b is None:
                    digs = hashlib.md5(t.encode()).hexdigest()[
                        :SIMHASH_HEX_DIGITS
                    ]
                    M = np.frombuffer(digs.encode(), dtype=np.uint8)
                    # hex char → value: '0'-'9' 48-57, 'a'-'f' 97-102
                    V = (M - 48 - (M >= 97) * 39).astype(np.uint8)
                    # (digits, 4) bit planes, MSB first → (48,)
                    b = ((V[:, None] >> shifts[None, :]) & 1).reshape(
                        SIMHASH_BITS
                    )
                    memo[t] = b
                rows[j] = b
            votes = rows.sum(axis=0, dtype=np.int64)
            out[ix] = int(((2 * votes > len(toks)) * weights).sum())
        return pd.Series(out)

    return sim


# --- winnowing-style document fingerprint ---------------------------------
# Min POLYNOMIAL ROLLING HASH over character k-grams — the selection
# step of winnowing (Schleimer et al., SIGMOD'03) with a global window,
# over Karp-Rabin window hashes h_i = Σ_j ord(c_{i+j}) · B^j.
#
# No modulus: with ASCII text (ord < 128, pinned by
# test_documents_fixture_is_ascii), B=131, k=8 the largest window hash is
# < 128 · Σ 131^j < 2^57 — exact int64 on every engine and in NumPy, so
# a BLAS-style kernel, a Spark SQL expression, and a DuckDB CTE agree
# bit-for-bit (the same integer-exactness playbook as the LSH planes).
# Round 3 replaced the earlier min-md5-over-8-grams definition: one md5 +
# substring allocation PER CHARACTER ran ~2-4 ms/row interpreted — the
# dominant cost of q_lang_id and not a rolling hash at all; this is the
# algorithm the name promises, at ~µs/row via `fingerprint_udf`.
# Texts shorter than k hash their full length; empty text → 0.

FINGERPRINT_K = 8
FP_BASE = 131


def _fp_weight(j: int) -> int:
    return FP_BASE**j


def spark_fingerprint(text_col: str = "text", k: int = FINGERPRINT_K) -> str:
    """Canonical Spark SQL definition (the hot path is the Arrow kernel
    ``fingerprint_udf``, pinned to this expression row-for-row in
    tests)."""
    terms = " + ".join(
        f"pmod(ascii(substring({text_col}, i + {j}, 1)), 256)"
        f" * CAST({_fp_weight(j)} AS BIGINT)"
        for j in range(k)
    )
    short = " + ".join(
        f"(CASE WHEN {j} < char_length({text_col}) THEN "
        f"pmod(ascii(substring({text_col}, {j + 1}, 1)), 256)"
        f" * CAST({_fp_weight(j)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(k)
    )
    return (
        f"CASE WHEN char_length({text_col}) >= {k} THEN "
        f"array_min(transform(sequence(1, char_length({text_col}) - {k - 1}), "
        f"i -> {terms})) "
        f"WHEN char_length({text_col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {short} END"
    )


def duckdb_fingerprint(text_col: str = "text", k: int = FINGERPRINT_K) -> str:
    terms = " + ".join(
        f"(ord(substring({text_col}, i + {j}, 1)) % 256)"
        f" * CAST({_fp_weight(j)} AS BIGINT)"
        for j in range(k)
    )
    short = " + ".join(
        f"(CASE WHEN {j} < length({text_col}) THEN "
        f"(ord(substring({text_col}, {j + 1}, 1)) % 256)"
        f" * CAST({_fp_weight(j)} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(k)
    )
    return (
        f"CASE WHEN length({text_col}) >= {k} THEN "
        f"list_min(list_transform(range(1, length({text_col}) - {k - 2}), "
        f"i -> {terms})) "
        f"WHEN length({text_col}) = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {short} END"
    )


def fingerprint_udf(k: int = FINGERPRINT_K):
    """Arrow-batched rolling-hash fingerprint: per row, the window
    hashes are ONE exact-int64 ``np.correlate`` of the byte codes with
    the weight vector (sliding dot product — the vectorized form of the
    Karp-Rabin recurrence), then a min.  ~µs/row vs ~ms/row for any
    per-window Catalyst expression."""
    from pyspark.sql.functions import pandas_udf

    W = np.array([_fp_weight(j) for j in range(k)], dtype=np.int64)

    @pandas_udf("long")
    def fp(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for ix, s in enumerate(text):
            if s is None:
                # The canonical SQL yields 0 for NULL: both length
                # CASE guards evaluate NULL (falsy) and fall through to
                # the short-string sum, whose per-position guards all
                # fall to their ELSE 0.  Pinned in tests.
                out[ix] = 0
                continue
            # Codepoints mod 256, matching the SQL forms' pmod(ascii(),
            # 256) / ord() % 256: the clamp keeps every window sum
            # < 2^58 (exact int64 on all three engines — unclamped CJK
            # codepoints overflowed, wrapping in Spark/NumPy but
            # HARD-ERRORING in DuckDB), and an .encode('ascii') here
            # crashed the whole batch on the first non-ASCII char
            # (round-3 review) where the canonical SQL just works.
            b = np.fromiter(map(ord, s), dtype=np.int64, count=len(s)) % 256
            n = len(b)
            if n == 0:
                out[ix] = 0
            elif n < k:
                out[ix] = int((b * W[:n]).sum())
            else:
                out[ix] = int(np.correlate(b, W).min())
        return pd.Series(out)

    return fp
