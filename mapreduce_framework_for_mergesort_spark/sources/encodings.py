"""HTTP content-encoding codecs (round 11) — closing the ``br``/``zstd``
seam that round 10 left loud.

Round 10's extraction audit classified brotli and zstd HTTP bodies as
``unsupported_encoding`` and dropped their text — on a modern crawl a
large fraction of bodies are ``br``, so this was the biggest real-data
gap (round-10 verdict, "What's missing" #1).  This module closes it
with two independent strategies per codec:

**Brotli (RFC 7932):**

* ``decode_brotli`` — a from-scratch, stdlib-only decoder of the full
  RFC 7932 format: stream header, meta-block structure (compressed /
  uncompressed / metadata), simple and complex prefix codes with the
  code-length-code and 16/17 repeat semantics, block switching for all
  three categories, context modes (LSB6/MSB6/UTF8/Signed), context
  maps with RLE + inverse-MTF, the insert-and-copy length code (11×64
  cells), postfix/direct distance codes with the 4-slot distance ring
  buffer, and static-dictionary references.
* The 122,784-byte static dictionary and the 2,048-byte context
  lookup tables are DATA the spec pins but this offline build cannot
  embed from thin air.  Both ship inside the brotli library that
  pyarrow links (public, MIT): ``_load_brotli_data`` locates them in
  ``libarrow`` by content — the dictionary by its known 40-byte prefix
  and the RFC-published SHA-256, the context LUT by its fully
  deterministic LSB6/MSB6 half (1,024 bytes this module reconstructs
  exactly, followed by the UTF8/Signed half it needs).  When the data
  cannot be found, streams that never touch it still decode; streams
  that do raise ``BrotliDataGap`` loudly.
* Dictionary TRANSFORMS (RFC 7932 §8, 121 entries) are likewise
  unreproducible data — so they are LEARNED: ``learn_transforms``
  compresses deterministic probe texts with the Arrow encoder and
  recovers each exercised id's (prefix, element-op, suffix) triple,
  accepting an entry ONLY when exactly one candidate replays every
  probe stream where that id was the single unknown to byte equality
  with the Arrow decode (the element ops — identity, ferment aka
  pseudo-uppercase, omit-first/last — are arithmetic from the spec;
  only the table pairing them with prefixes/suffixes is data).  The
  58 encoder-exercised entries ship as
  ``data/brotli_transforms_learned.json``; with them the house
  decoder round-trips real English/HTML brotli at EVERY quality level
  with zero gaps.  Unexercised ids raise ``BrotliTransformGap``
  loudly and the wrapper falls back to the Arrow codec.  Learning
  soundness notes live on ``learn_transforms`` (local-viability
  votes are intersected on validated replays only — speculative-parse
  instances can mislabel (id, word) pairs — and promotion is gated on
  exact global validation, never plurality).
* ``brotli_decompress`` — the production wrapper: Arrow's C brotli
  codec when available (fast path; output size recovered by bounded
  bisection because HTTP bodies carry no decompressed size), the house
  decoder otherwise.  Tests cross-pin the two byte-for-byte on
  round-trips at every compression level.

**Zstandard (RFC 8878):** ``zstd_decompress`` parses the frame header
for ``Frame_Content_Size`` (present in almost all encoder output) and
decompresses via the Arrow codec; frames without a content size fall
back to direction-guided bisection (Arrow's zstd raises a
distinguishable error for too-small vs not-exact buffers).

**gzip / deflate:** stdlib ``zlib`` (re-exported here so the WARC layer
has one decode entry point).

**LZW (round 12):** ``decode_lzw``/``encode_lzw`` implement the Unix
``compress(1)`` ``.Z`` container — the HTTP ``compress`` coding —
from scratch, including the two historical conventions interop
requires: the 8-code unit padding on every width change / CLEAR, and
the ``maxbits==9`` bug-compat fire that widens codes to TEN bits when
the table fills (both pinned against the system ``uncompress``).

Reference parity note: the reference engine (``/root/reference``) has
no HTTP layer at all; this is part of the crawl-curation surface the
brief layers on top (see ``sources/warc.py``).
"""

from __future__ import annotations

import hashlib
import os
import zlib
from functools import lru_cache

# ---------------------------------------------------------------------------
# errors
# ---------------------------------------------------------------------------


class BrotliError(ValueError):
    """Malformed brotli stream."""


class BrotliOutputCapExceeded(BrotliError):
    """The stream is (so far) WELL-FORMED but its output passed the
    caller's ``max_output`` cap — distinct from corruption so the
    wrapper's never-succeeds classifier (round 12, ADVICE) can tell a
    legal-but-huge stream from garbage bytes."""


class BrotliDataGap(NotImplementedError):
    """The stream needs spec DATA this build could not obtain (static
    dictionary, context tables, or a non-identity dictionary
    transform).  Callers fall back to the Arrow codec."""


class BrotliTransformGap(BrotliDataGap):
    """A dictionary reference used a transform id the learned table
    doesn't cover.  Carries what the LEARNER needs: which transform,
    which word, and where in the output it lands."""

    def __init__(self, transform_id: int, word: bytes, out_pos: int):
        super().__init__(
            f"dictionary transform {transform_id} not in the learned "
            "table (transform table is spec data; see learn_transforms)"
        )
        self.transform_id = transform_id
        self.word = word
        self.out_pos = out_pos


# ---------------------------------------------------------------------------
# spec tables that are ARITHMETIC (reproducible from RFC 7932)
# ---------------------------------------------------------------------------

#: Code-length-code symbol order (§3.5).
_CL_ORDER = (1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: Fixed prefix code for code-length-code lengths: peek 4 bits LSB-first
#: → (bits consumed, value).
_CL_PREFIX = tuple(
    ((2, 2, 2, 3, 2, 2, 2, 4, 2, 2, 2, 3, 2, 2, 2, 4)[i],
     (0, 4, 3, 2, 0, 4, 3, 1, 0, 4, 3, 2, 0, 4, 3, 5)[i])
    for i in range(16)
)

#: Insert length code: (base, extra bits) for codes 0..23 (§5).
_INSERT_LEN = (
    (0, 0), (1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (8, 1),
    (10, 2), (14, 2), (18, 3), (26, 3), (34, 4), (50, 4), (66, 5),
    (98, 5), (130, 6), (194, 7), (322, 8), (578, 9), (1090, 10),
    (2114, 12), (6210, 14), (22594, 24),
)

#: Copy length code: (base, extra bits) for codes 0..23 (§5).
_COPY_LEN = (
    (2, 0), (3, 0), (4, 0), (5, 0), (6, 0), (7, 0), (8, 0), (9, 0),
    (10, 1), (12, 1), (14, 2), (18, 2), (22, 3), (30, 3), (38, 4),
    (54, 4), (70, 5), (102, 5), (134, 6), (198, 7), (326, 8),
    (582, 9), (1094, 10), (2118, 24),
)

#: Insert/copy range starts for cells 2..10 of the 704-symbol
#: insert-and-copy code (§5); cells 0..1 are (0, 0) / (0, 8) with
#: implicit last-distance.
_INS_RANGE = (0, 0, 8, 8, 0, 16, 8, 16, 16)
_COPY_RANGE = (0, 8, 0, 8, 16, 0, 16, 8, 16)

#: Block count code: (base, extra bits) for codes 0..25 (§6).
_BLOCK_LEN = (
    (1, 2), (5, 2), (9, 2), (13, 2), (17, 3), (25, 3), (33, 3),
    (41, 3), (49, 4), (65, 4), (81, 4), (97, 4), (113, 5), (145, 5),
    (177, 5), (209, 5), (241, 6), (305, 6), (369, 7), (497, 8),
    (753, 9), (1265, 10), (2289, 11), (4337, 12), (8433, 13),
    (16625, 24),
)

#: Distance short codes 0..15: (ring-buffer index offset from newest,
#: value delta) (§4).
_DIST_SHORT = (
    (0, 0), (1, 0), (2, 0), (3, 0),
    (0, -1), (0, 1), (0, -2), (0, 2), (0, -3), (0, 3),
    (1, -1), (1, 1), (1, -2), (1, 2), (1, -3), (1, 3),
)

#: Static dictionary: words-per-length bits, lengths 0..24 (§8).
_DICT_SIZE_BITS = (
    0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7,
    8, 7, 7, 6, 6, 5, 5,
)
_DICT_OFFSETS = [0] * 26
for _l in range(4, 25):
    _DICT_OFFSETS[_l + 1] = _DICT_OFFSETS[_l] + _l * (
        (1 << _DICT_SIZE_BITS[_l]) if _l >= 4 else 0
    )
_DICT_OFFSETS = tuple(_DICT_OFFSETS)
_DICT_TOTAL = _DICT_OFFSETS[25]  # 122784

#: RFC 7932 Appendix A pins the dictionary by this digest.
_DICT_SHA256 = (
    "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"
)
_DICT_PREFIX = b"timedownlifeleftbackcodedatashowonlysite"


# ---------------------------------------------------------------------------
# spec DATA located inside the linked brotli library (see module doc)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=1)
def _load_brotli_data() -> tuple[bytes | None, bytes | None]:
    """(static dictionary, UTF8+Signed context luts) or (None, None)
    parts when not found.  Content-addressed search over the arrow
    shared libraries: the dictionary by prefix + SHA-256 pin; the
    2,048-byte context LUT by its deterministic first half (LSB6 lut =
    ``i & 63`` then zeros, MSB6 lut = ``i >> 2`` then zeros — exactly
    reconstructible), taking the UTF8/Signed half that follows."""
    candidates: list[str] = []
    try:
        import pyarrow

        d = os.path.dirname(pyarrow.__file__)
        for name in sorted(os.listdir(d)):
            if ".so" in name or name.endswith(".dylib"):
                candidates.append(os.path.join(d, name))
        # largest first: libarrow carries the statically linked brotli
        candidates.sort(key=lambda p: -os.path.getsize(p))
    except Exception:
        pass
    lut_prefix = (
        bytes(i & 63 for i in range(256)) + bytes(256)
        + bytes(i >> 2 for i in range(256)) + bytes(256)
    )
    dictionary = None
    ctx_luts = None
    for path in candidates:
        try:
            with open(path, "rb") as f:
                blob = f.read()
        except OSError:
            continue
        if dictionary is None:
            i = blob.find(_DICT_PREFIX)
            if i >= 0:
                cand = blob[i:i + _DICT_TOTAL]
                if hashlib.sha256(cand).hexdigest() == _DICT_SHA256:
                    dictionary = cand
        if ctx_luts is None:
            j = blob.find(lut_prefix)
            if j >= 0:
                cand = blob[j + 1024:j + 2048]
                # self-check: the Signed half is generable from the
                # spec's bucketing rule — a wrong hit cannot pass
                lut2 = _signed_lut2()
                if (
                    len(cand) == 1024
                    and bytes(v << 3 for v in lut2) == cand[512:768]
                    and bytes(lut2) == cand[768:1024]
                ):
                    ctx_luts = cand
        if dictionary is not None and ctx_luts is not None:
            break
    return dictionary, ctx_luts


def _signed_lut2() -> list[int]:
    """RFC 7932 §7.1 Signed-mode bucketing (generable)."""
    out = []
    for b in range(256):
        if b == 0:
            out.append(0)
        elif b < 16:
            out.append(1)
        elif b < 64:
            out.append(2)
        elif b < 128:
            out.append(3)
        elif b < 192:
            out.append(4)
        elif b < 240:
            out.append(5)
        elif b < 255:
            out.append(6)
        else:
            out.append(7)
    return out


# ---------------------------------------------------------------------------
# bit reader (LSB-first, §2)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > len(self.data) * 8:
            raise BrotliError("truncated brotli stream")
        v = 0
        shift = 0
        data = self.data
        while n > 0:
            byte = data[p >> 3]
            off = p & 7
            take = min(8 - off, n)
            v |= ((byte >> off) & ((1 << take) - 1)) << shift
            shift += take
            p += take
            n -= take
        self.pos = p
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.data) * 8:
            raise BrotliError("truncated brotli stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1

    def align_byte(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_bytes(self, n: int) -> bytes:
        assert self.pos % 8 == 0
        start = self.pos >> 3
        if start + n > len(self.data):
            raise BrotliError("truncated brotli stream")
        self.pos += n * 8
        return self.data[start:start + n]


# ---------------------------------------------------------------------------
# prefix (huffman) codes (§3)
# ---------------------------------------------------------------------------


class _Prefix:
    """Canonical prefix decoder.  ``table`` maps (length, code-read-
    MSB-first) → symbol; ``single`` short-circuits one-symbol codes
    (zero bits consumed, as the format requires)."""

    __slots__ = ("table", "single", "max_len")

    def __init__(self, lengths: dict[int, int], alphabet: int) -> None:
        nonzero = {s: ln for s, ln in lengths.items() if ln > 0}
        if not nonzero:
            raise BrotliError("empty prefix code")
        if len(nonzero) == 1:
            self.single = next(iter(nonzero))
            self.table = {}
            self.max_len = 0
            return
        self.single = None
        # Kraft check: must be exactly full
        space = sum(1 << (15 - ln) for ln in nonzero.values())
        if space != (1 << 15):
            raise BrotliError("prefix code not exactly full")
        code = 0
        table: dict[tuple[int, int], int] = {}
        self.max_len = max(nonzero.values())
        for ln in range(1, self.max_len + 1):
            for sym in sorted(s for s, v in nonzero.items() if v == ln):
                table[(ln, code)] = sym
                code += 1
            code <<= 1
        self.table = table

    def decode(self, br: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        table = self.table
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise BrotliError("invalid prefix code word")


def _read_simple_prefix(br: _Bits, alphabet: int) -> _Prefix:
    nsym = br.read(2) + 1
    abits = max(1, (alphabet - 1).bit_length())
    syms = [br.read(abits) for _ in range(nsym)]
    if any(s >= alphabet for s in syms):
        raise BrotliError("simple prefix symbol out of range")
    if len(set(syms)) != nsym:
        raise BrotliError("duplicate simple prefix symbol")
    if nsym == 1:
        return _Prefix({syms[0]: 1}, alphabet)
    # lengths attach to symbols in READ order; equal-length symbols
    # then get canonical (sorted) codes inside _Prefix, which is the
    # format's rule for every simple-code shape
    if nsym == 2:
        lens = [1, 1]
    elif nsym == 3:
        lens = [1, 2, 2]
    else:
        lens = [1, 2, 3, 3] if br.read_bit() else [2, 2, 2, 2]
    return _Prefix(dict(zip(syms, lens)), alphabet)


def _read_complex_prefix(br: _Bits, alphabet: int, hskip: int) -> _Prefix:
    # code lengths for the code-length code (§3.5)
    cl_lens = {}
    space = 0
    num_codes = 0
    for i in range(hskip, 18):
        peek_pos = br.pos
        # fixed code: peek up to 4 bits (zero-padded near stream end)
        avail = len(br.data) * 8 - peek_pos
        p = 0
        for k in range(min(4, avail)):
            p |= br.read_bit() << k
        take, val = _CL_PREFIX[p & 15]
        if take > avail:
            raise BrotliError("truncated brotli stream")
        br.pos = peek_pos + take
        if val:
            cl_lens[_CL_ORDER[i]] = val
            space += 32 >> val
            num_codes += 1
            if space >= 32:
                break
    if num_codes == 1:
        cl_code = _Prefix({next(iter(cl_lens)): 1}, 18)
    elif space != 32:
        raise BrotliError("code length code not exactly full")
    else:
        cl_code = _Prefix(cl_lens, 18)

    lengths: dict[int, int] = {}
    sym = 0
    space = 0
    prev_len = 8
    repeat = 0
    repeat_len = 0  # length being repeated by 16, or 0 for 17
    prev_code = -1
    while sym < alphabet and space < (1 << 15):
        code = cl_code.decode(br)
        if code < 16:
            lengths[sym] = code
            sym += 1
            if code:
                prev_len = code
                space += (1 << 15) >> code
            prev_code = code
            repeat = 0
        else:
            extra_bits = 2 if code == 16 else 3
            new_len = prev_len if code == 16 else 0
            if prev_code == code and (code != 16 or repeat_len == new_len):
                old = repeat
                repeat = ((repeat - 2) << extra_bits) + 3 + br.read(
                    extra_bits
                )
            else:
                old = 0
                repeat = 3 + br.read(extra_bits)
            repeat_len = new_len
            n = repeat - old
            if sym + n > alphabet:
                raise BrotliError("repeat past alphabet end")
            for _ in range(n):
                lengths[sym] = new_len
                sym += 1
            if new_len:
                space += n * ((1 << 15) >> new_len)
            prev_code = code
    if space != (1 << 15):
        raise BrotliError("symbol code not exactly full")
    return _Prefix(lengths, alphabet)


def _read_prefix_code(br: _Bits, alphabet: int) -> _Prefix:
    two = br.read(2)
    if two == 1:
        return _read_simple_prefix(br, alphabet)
    return _read_complex_prefix(br, alphabet, two)


# ---------------------------------------------------------------------------
# helpers: varlen counts, block switching, context maps (§6, §7)
# ---------------------------------------------------------------------------


def _decode_varlen_uint8(br: _Bits) -> int:
    if not br.read_bit():
        return 0
    n = br.read(3)
    if n == 0:
        return 1
    return br.read(n) + (1 << n)


def _read_block_len(br: _Bits, code: _Prefix) -> int:
    sym = code.decode(br)
    base, extra = _BLOCK_LEN[sym]
    return base + br.read(extra)


def _read_context_map(br: _Bits, size: int, ntrees: int) -> list[int]:
    if ntrees == 1:
        return [0] * size
    rlemax = br.read(4) + 1 if br.read_bit() else 0
    code = _read_prefix_code(br, ntrees + rlemax)
    cmap: list[int] = []
    while len(cmap) < size:
        sym = code.decode(br)
        if sym == 0:
            cmap.append(0)
        elif sym <= rlemax:
            run = (1 << sym) + br.read(sym)
            if len(cmap) + run > size:
                raise BrotliError("context map run overflow")
            cmap.extend([0] * run)
        else:
            cmap.append(sym - rlemax)
    if br.read_bit():  # inverse move-to-front
        mtf = list(range(256))
        for i, v in enumerate(cmap):
            val = mtf[v]
            if v:
                del mtf[v]
                mtf.insert(0, val)
            cmap[i] = val
    if any(v >= ntrees for v in cmap):
        raise BrotliError("context map value out of range")
    return cmap


class _BlockState:
    """Block type + remaining length for one category."""

    __slots__ = ("ntypes", "btype", "prev", "blen", "tcode", "lcode")

    def __init__(self, br: _Bits) -> None:
        self.ntypes = _decode_varlen_uint8(br) + 1
        self.btype = 0
        self.prev = 1
        if self.ntypes >= 2:
            self.tcode = _read_prefix_code(br, self.ntypes + 2)
            self.lcode = _read_prefix_code(br, 26)
            self.blen = _read_block_len(br, self.lcode)
        else:
            self.tcode = None
            self.lcode = None
            self.blen = 1 << 60  # never switches

    def switch(self, br: _Bits) -> None:
        sym = self.tcode.decode(br)
        if sym == 0:
            new = self.prev
        elif sym == 1:
            new = (self.btype + 1) % self.ntypes
        else:
            new = sym - 2
        self.prev = self.btype
        self.btype = new
        self.blen = _read_block_len(br, self.lcode)


# ---------------------------------------------------------------------------
# the decoder (§9, §10)
# ---------------------------------------------------------------------------


# --- dictionary-word transforms (RFC 7932 §8.2) ----------------------------
#
# A transform is (prefix bytes, element op, suffix bytes).  The OPS are
# arithmetic and implemented from the spec; the 121-entry TABLE pairing
# them with prefixes/suffixes is data — LEARNED from Arrow-encoded
# streams by ``learn_transforms`` (every entry validated by full-stream
# byte equality before acceptance, never guessed) and shipped as
# ``data/brotli_transforms_learned.json``.

def _ferment(word: bytearray, pos: int) -> int:
    """The spec's pseudo-uppercase step: ASCII a-z flip bit 5; UTF-8
    2-byte sequences flip bit 5 of byte 2; 3-byte sequences XOR byte 3
    with 5.  Returns the number of bytes consumed."""
    c = word[pos]
    if c < 192:
        if 97 <= c <= 122:
            word[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(word):
            word[pos + 1] ^= 32
        return 2
    if pos + 2 < len(word):
        word[pos + 2] ^= 5
    return 3


#: op name → callable(word bytes) -> bytes
def _op_identity(w: bytes) -> bytes:
    return w


def _make_omit_first(k: int):
    return lambda w: w[k:]


def _make_omit_last(k: int):
    return lambda w: w[:-k] if len(w) > k else b""


def _op_ferment_first(w: bytes) -> bytes:
    b = bytearray(w)
    if b:
        _ferment(b, 0)
    return bytes(b)


def _op_ferment_all(w: bytes) -> bytes:
    b = bytearray(w)
    pos = 0
    while pos < len(b):
        pos += _ferment(b, pos)
    return bytes(b)


TRANSFORM_OPS = {
    "identity": _op_identity,
    "ferment_first": _op_ferment_first,
    "ferment_all": _op_ferment_all,
    **{f"omit_first_{k}": _make_omit_first(k) for k in range(1, 10)},
    **{f"omit_last_{k}": _make_omit_last(k) for k in range(1, 10)},
}


def apply_transform(word: bytes, prefix: bytes, op: str, suffix: bytes) -> bytes:
    return prefix + TRANSFORM_OPS[op](word) + suffix


@lru_cache(maxsize=1)
def _learned_transforms() -> dict:
    """{transform_id: (prefix, op, suffix)} from the learned-table
    resource, {} when absent.  Entry 0 is always identity per spec."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data",
        "brotli_transforms_learned.json",
    )
    table = {0: (b"", "identity", b"")}
    try:
        import json

        with open(path) as f:
            doc = json.load(f)
        for k, v in doc.get("transforms", {}).items():
            table[int(k)] = (
                bytes.fromhex(v["prefix"]),
                v["op"],
                bytes.fromhex(v["suffix"]),
            )
    except OSError:
        pass
    return table


def decode_brotli(
    data: bytes,
    max_output: int = 1 << 30,
    transforms: dict | None = None,
    _expected: bytes | None = None,
) -> bytes:
    """Decode one complete brotli stream (RFC 7932).  Raises
    ``BrotliError`` on malformed input, ``BrotliDataGap`` when the
    stream references spec data this build couldn't locate (see module
    docstring).  ``transforms`` overrides the learned dictionary
    transform table (id → (prefix, op, suffix)).  ``_expected`` is the
    LEARNER's fail-fast hook: when set, output is verified against it
    incrementally so a wrong transform hypothesis dies within a few
    commands instead of after a full decode (this is what keeps the
    transform-learning search tree linear)."""
    br = _Bits(data)

    def _chk(start: int) -> None:
        if _expected is None:
            return
        if len(out) > len(_expected) or (
            bytes(out[start:]) != _expected[start:len(out)]
        ):
            raise BrotliError("diverged from expected output")
    # stream header: window size
    if br.read_bit() == 0:
        wbits = 16
    else:
        n = br.read(3)
        if n != 0:
            wbits = 17 + n
        else:
            m = br.read(3)
            if m == 0:
                wbits = 17
            elif m == 1:
                raise BrotliError("invalid window bits")
            else:
                wbits = 8 + m
    window = (1 << wbits) - 16
    out = bytearray()
    dictionary = None  # lazy
    # STREAM state, not meta-block state (found by differential fuzz
    # vs the Arrow codec: a multi-meta-block level-2 stream reused a
    # distance from the previous meta-block through a short code) —
    # the ring persists across meta-blocks exactly like the p1/p2
    # literal context bytes do
    dist_rb = [16, 15, 11, 4]
    dist_rb_idx = 0  # slot of NEXT write; newest is idx-1

    islast = False
    while not islast:
        islast = bool(br.read_bit())
        if islast and br.read_bit():
            break  # ISLASTEMPTY
        mnibbles = br.read(2)
        if mnibbles == 3:  # metadata block
            if br.read_bit():
                raise BrotliError("reserved metadata bit set")
            mskipbytes = br.read(2)
            skip = 0
            for i in range(mskipbytes):
                b = br.read(8)
                if i == mskipbytes - 1 and mskipbytes > 1 and b == 0:
                    raise BrotliError("metadata length has zero high byte")
                skip |= b << (8 * i)
            if mskipbytes:
                skip += 1
            br.align_byte()
            br.read_bytes(skip)
            continue
        mlen = 0
        for i in range(mnibbles + 4):
            mlen |= br.read(4) << (4 * i)
        mlen += 1
        if len(out) + mlen > max_output:
            raise BrotliOutputCapExceeded("output exceeds max_output cap")
        if not islast and br.read_bit():  # ISUNCOMPRESSED
            br.align_byte()
            out += br.read_bytes(mlen)
            _chk(len(out) - mlen)
            continue

        bs_l = _BlockState(br)
        bs_i = _BlockState(br)
        bs_d = _BlockState(br)
        npostfix = br.read(2)
        ndirect = br.read(4) << npostfix
        ctx_modes = [br.read(2) for _ in range(bs_l.ntypes)]
        ntrees_l = _decode_varlen_uint8(br) + 1
        cmap_l = _read_context_map(br, 64 * bs_l.ntypes, ntrees_l)
        ntrees_d = _decode_varlen_uint8(br) + 1
        cmap_d = _read_context_map(br, 4 * bs_d.ntypes, ntrees_d)
        lit_codes = [_read_prefix_code(br, 256) for _ in range(ntrees_l)]
        ins_codes = [
            _read_prefix_code(br, 704) for _ in range(bs_i.ntypes)
        ]
        dist_alphabet = 16 + ndirect + (48 << npostfix)
        dist_codes = [
            _read_prefix_code(br, dist_alphabet) for _ in range(ntrees_d)
        ]

        mpos = 0
        while mpos < mlen:
            if bs_i.blen == 0:
                bs_i.switch(br)
            bs_i.blen -= 1
            sym = ins_codes[bs_i.btype].decode(br)
            cell = sym >> 6
            if cell < 2:
                ins_code = (sym >> 3) & 7
                copy_code = (cell << 3) + (sym & 7)
                implicit = True
            else:
                ins_code = _INS_RANGE[cell - 2] + ((sym >> 3) & 7)
                copy_code = _COPY_RANGE[cell - 2] + (sym & 7)
                implicit = False
            base, extra = _INSERT_LEN[ins_code]
            insert_len = base + br.read(extra)
            base, extra = _COPY_LEN[copy_code]
            copy_len = base + br.read(extra)

            for _ in range(insert_len):
                if bs_l.blen == 0:
                    bs_l.switch(br)
                bs_l.blen -= 1
                if ntrees_l == 1 and bs_l.ntypes == 1:
                    tree = lit_codes[0]
                else:
                    mode = ctx_modes[bs_l.btype]
                    p1 = out[-1] if out else 0
                    p2 = out[-2] if len(out) >= 2 else 0
                    if mode == 0:
                        cid = p1 & 0x3F
                    elif mode == 1:
                        cid = p1 >> 2
                    else:
                        luts = _context_luts()
                        if luts is None:
                            raise BrotliDataGap(
                                "UTF8/Signed context tables unavailable"
                            )
                        half = 0 if mode == 2 else 512
                        cid = (
                            luts[half + p1] | luts[half + 256 + p2]
                        )
                    tree = lit_codes[cmap_l[bs_l.btype * 64 + cid]]
                out.append(tree.decode(br))
                _chk(len(out) - 1)
                mpos += 1
            if mpos > mlen:
                raise BrotliError("insert length overruns meta-block")
            if mpos == mlen:
                break

            max_dist = min(window, len(out))
            if implicit:
                distance = dist_rb[(dist_rb_idx - 1) & 3]
                dcode = 0
            else:
                if bs_d.blen == 0:
                    bs_d.switch(br)
                bs_d.blen -= 1
                cid_d = min(copy_len - 2, 3)
                tree = dist_codes[cmap_d[bs_d.btype * 4 + cid_d]]
                dcode = tree.decode(br)
                if dcode == 0:
                    distance = dist_rb[(dist_rb_idx - 1) & 3]
                elif dcode < 16:
                    idx_off, delta = _DIST_SHORT[dcode]
                    distance = (
                        dist_rb[(dist_rb_idx - 1 - idx_off) & 3] + delta
                    )
                    if distance <= 0:
                        raise BrotliError("non-positive short distance")
                elif dcode < 16 + ndirect:
                    distance = dcode - 16 + 1
                else:
                    x = dcode - ndirect - 16
                    hcode = x >> npostfix
                    lcode = x & ((1 << npostfix) - 1)
                    ndistbits = 1 + (hcode >> 1)
                    offset = ((2 + (hcode & 1)) << ndistbits) - 4
                    distance = (
                        ((offset + br.read(ndistbits)) << npostfix)
                        + lcode + ndirect + 1
                    )
            if distance <= max_dist:
                if dcode != 0:
                    dist_rb[dist_rb_idx & 3] = distance
                    dist_rb_idx += 1
                if copy_len < 1:
                    raise BrotliError("zero copy length")
                if mpos + copy_len > mlen:
                    raise BrotliError("copy overruns meta-block")
                start = len(out) - distance
                for i in range(copy_len):  # may self-overlap
                    out.append(out[start + i])
                _chk(len(out) - copy_len)
                mpos += copy_len
            else:
                # static dictionary reference (§8)
                if not 4 <= copy_len <= 24:
                    raise BrotliError(
                        f"dictionary word length {copy_len} out of range"
                    )
                if dictionary is None:
                    dictionary = _load_brotli_data()[0]
                    if dictionary is None:
                        raise BrotliDataGap(
                            "static dictionary unavailable"
                        )
                address = distance - max_dist - 1
                bits = _DICT_SIZE_BITS[copy_len]
                word_idx = address & ((1 << bits) - 1)
                transform_id = address >> bits
                if transform_id >= 121:
                    raise BrotliError("transform id out of range")
                table = (
                    transforms
                    if transforms is not None
                    else _learned_transforms()
                )
                if transform_id not in table:
                    off = _DICT_OFFSETS[copy_len] + word_idx * copy_len
                    raise BrotliTransformGap(
                        transform_id,
                        dictionary[off:off + copy_len],
                        len(out),
                    )
                off = _DICT_OFFSETS[copy_len] + word_idx * copy_len
                pre, op, suf = table[transform_id]
                word = apply_transform(
                    dictionary[off:off + copy_len], pre, op, suf
                )
                if mpos + len(word) > mlen:
                    raise BrotliError("dictionary word overruns meta-block")
                out += word
                _chk(len(out) - len(word))
                mpos += len(word)
    # an HTTP body is exactly ONE stream: full bytes beyond the final
    # meta-block (plus its zero-padding to the byte boundary) are
    # damage, not a second stream
    if (len(data) * 8 - br.pos) >= 8:
        raise BrotliError("trailing bytes after final meta-block")
    return bytes(out)


@lru_cache(maxsize=1)
def _context_luts() -> bytes | None:
    return _load_brotli_data()[1]


# ---------------------------------------------------------------------------
# production wrappers (Arrow codec primary, house decoder fallback)
# ---------------------------------------------------------------------------


def _arrow_codec(name: str):
    try:
        import pyarrow as pa

        if pa.Codec.is_available(name):
            return pa.Codec(name)
    except Exception:
        pass
    return None


def _brotli_looks_corrupt(data: bytes, cap: int = 1 << 20) -> bool:
    """Bounded house-decoder probe for the never-succeeds path: True
    means PROVABLY malformed (the from-scratch RFC 7932 decoder hit a
    structural error before reaching ``cap`` output bytes); False
    means legal-so-far or undecidable (cap reached, an unlearned
    transform, any unexpected failure — all benefit of the doubt).
    Cheap by construction: the cap check fires on the meta-block
    HEADER (`len(out) + mlen > cap`), so a legal stream with big
    meta-blocks exits after parsing one header, and corrupt bytes die
    at the first bad prefix code — no gigabyte of Python decode either
    way."""
    try:
        decode_brotli(data, max_output=cap)
        return False
    except BrotliOutputCapExceeded:
        return False
    except BrotliDataGap:
        return False
    except BrotliError:
        return True
    except Exception:
        return False


def _arrow_decompress_bisect(
    codec, data: bytes, max_output: int = 1 << 30
) -> bytes:
    """Recover the output of a sizeless stream through a codec whose
    ``decompress`` demands the exact size: failure on a too-small
    buffer is reliable, so the smallest size that succeeds IS the true
    size — found by doubling then bisection (~2·log2 attempts against
    a fast C decoder).

    Corrupt input fails at EVERY size (measured: Arrow raises 'Corrupt
    brotli compressed data' regardless of the buffer), which the first
    cut reported as 'exceeds cap' after allocating up-to-cap buffers
    on the way (round-11 ADVICE).  Now the house decoder arbitrates:
    before the doubling ladder crosses 64 MB, and again if it exhausts
    the cap, a bounded structural probe (`_brotli_looks_corrupt`)
    separates garbage bytes (→ 'corrupt') from a legal stream that is
    genuinely bigger than the cap (→ 'exceeds cap')."""

    def ok(n: int):
        try:
            buf = codec.decompress(data, n)
            return bytes(
                buf.to_pybytes() if hasattr(buf, "to_pybytes") else buf
            )
        except Exception:
            return None

    probed = False
    hi = max(4 * len(data), 1 << 12)
    while ok(hi) is None:
        if not probed and hi * 4 > (1 << 26):
            # about to start allocating big attempt buffers — check
            # once whether the stream is even structurally brotli
            probed = True
            if _brotli_looks_corrupt(data):
                raise ValueError(
                    "corrupt brotli data (no output size succeeds)"
                )
        if hi >= max_output:
            if _brotli_looks_corrupt(data):
                raise ValueError(
                    "corrupt brotli data (no output size succeeds)"
                )
            raise ValueError("decompressed output exceeds cap")
        hi = min(hi * 4, max_output)
    lo = 0
    while lo < hi:
        mid = (lo + hi) // 2
        if ok(mid) is None:
            lo = mid + 1
        else:
            hi = mid
    result = ok(lo)
    assert result is not None
    return result[:lo]


def brotli_decompress(data: bytes, max_output: int = 1 << 30) -> bytes:
    """Production brotli decode: Arrow's C codec when present (output
    size bisected — HTTP carries none), the house RFC 7932 decoder
    otherwise; the two are cross-pinned byte-for-byte in tests."""
    codec = _arrow_codec("brotli")
    if codec is not None:
        return _arrow_decompress_bisect(codec, data, max_output)
    return decode_brotli(data, max_output)


def _zstd_frame_content_size(data: bytes) -> int | None:
    """RFC 8878 §3.1.1: Frame_Content_Size from the frame header, or
    None when the frame omits it / isn't a zstd frame."""
    if len(data) < 5 or data[:4] != b"\x28\xb5\x2f\xfd":
        return None
    fhd = data[4]
    fcs_flag = fhd >> 6
    single_segment = (fhd >> 5) & 1
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor
    did_size = (0, 1, 2, 4)[fhd & 3]
    pos += did_size
    if fcs_flag == 0 and not single_segment:
        return None
    n = (1, 2, 4, 8)[fcs_flag]
    if len(data) < pos + n:
        return None
    v = int.from_bytes(data[pos:pos + n], "little")
    if n == 2:
        v += 256
    return v


def zstd_decompress(data: bytes, max_output: int = 1 << 30) -> bytes:
    """zstd decode via the Arrow codec: exact size from the frame
    header when present (nearly always), bisection fallback."""
    codec = _arrow_codec("zstd")
    if codec is None:
        raise NotImplementedError(
            "content-encoding 'zstd' requires the Arrow zstd codec"
        )
    size = _zstd_frame_content_size(data)
    if size is not None:
        if size > max_output:
            raise ValueError("decompressed output exceeds cap")
        try:
            buf = codec.decompress(data, size)
            return bytes(
                buf.to_pybytes() if hasattr(buf, "to_pybytes") else buf
            )
        except Exception:
            # the header size covers only the FIRST frame: a legal
            # multi-frame concatenation (or a lying header) falls back
            # to the exact-size search instead of failing outright
            pass
    return _zstd_bisect(codec, data, max_output)


@lru_cache(maxsize=1)
def _zstd_undersize_signature() -> str | None:
    """The running pyarrow's OWN error message for an undersized zstd
    output buffer, learned by self-probe: compress a known payload,
    decompress it with size 0, record what the library says.  The
    bisect classifies direction against THIS string, so a pyarrow
    release that rewords the message re-learns it automatically
    instead of silently sending the search the wrong way (round-11
    ADVICE).  The message carries no sizes or payload text (measured:
    'ZSTD decompression failed: Destination buffer is too small'), so
    exact equality is the right comparison."""
    codec = _arrow_codec("zstd")
    if codec is None:
        return None
    try:
        buf = codec.compress(b"zstd signature probe payload " * 8)
        comp = bytes(
            buf.to_pybytes() if hasattr(buf, "to_pybytes") else buf
        )
        codec.decompress(comp, 0)
    except Exception as ex:
        return str(ex)
    return None


def _zstd_bisect(codec, data: bytes, max_output: int = 1 << 30) -> bytes:
    """Sizeless-frame fallback.  Arrow's zstd accepts only the EXACT
    size — measured: an OVERSIZED buffer fails too ('Corrupt ZSTD
    compressed data' at true+1), so brotli's monotone doubling cannot
    apply here.  But the errors encode direction: the undersize
    message (learned at runtime from the library itself, see
    ``_zstd_undersize_signature``) means the guess is low; anything
    else — oversize or genuine corruption — means high.  Corrupt input
    is every-guess-high, so the search exhausts and raises; legal
    sizeless/multi-frame bodies converge on the exact size."""
    sig = _zstd_undersize_signature()
    lo, hi = 0, max(4 * len(data), 1 << 12)
    while lo <= hi:
        mid = (lo + hi) // 2
        try:
            buf = codec.decompress(data, mid)
            return bytes(
                buf.to_pybytes() if hasattr(buf, "to_pybytes") else buf
            )
        except Exception as ex:
            msg = str(ex)
            # learned signature (digit-stripped, in case a future
            # wording embeds the attempted size) OR the known-wording
            # substring — either marks the guess as low
            strip = str.maketrans("", "", "0123456789")
            low = "too small" in msg.lower() or (
                sig is not None
                and msg.translate(strip) == sig.translate(strip)
            )
            if low:
                lo = mid + 1
                if lo > hi and hi < max_output:
                    hi = min(hi * 4, max_output)
            else:
                hi = mid - 1
    raise ValueError("could not determine zstd output size (corrupt?)")


# ---------------------------------------------------------------------------
# LZW — the `compress` content-coding (round 12)
# ---------------------------------------------------------------------------

#: compress(1) container magic (the .Z format)
LZW_MAGIC = b"\x1f\x9d"


def decode_lzw(data: bytes, max_output: int = 1 << 30) -> bytes:
    """Decode a Unix ``compress(1)`` ``.Z`` stream — the HTTP
    ``compress`` content-coding (round 12; until now the planted
    permanent-unsupported-coding demo, but LZW is a ~50-line public
    algorithm from the RFC 1951-era specs, so the
    ``unsupported_encoding`` class now holds only genuinely exotic
    codings).

    Format (public knowledge — the compress/ncompress sources and the
    GIF-era LZW spec): magic ``1f 9d``; a flags byte (bits 0–4 = max
    code width 9–16, bit 7 = block mode, i.e. code 256 is CLEAR);
    then LSB-first variable-width codes starting at 9 bits, widening
    when the next table index no longer fits.  The historical quirk a
    correct decoder MUST mirror: the compressor flushes its output in
    units of 8 codes (= ``width`` bytes), so on every width change and
    after every CLEAR the bitstream is zero-padded to the next
    ``width``-byte unit boundary of the current segment — pinned here
    against the system ``uncompress`` (gzip's unlzw), which rejects
    any other convention."""
    if len(data) < 3 or data[:2] != LZW_MAGIC:
        raise ValueError("not a compress(1) LZW stream (bad magic)")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if flags & 0x60:
        raise ValueError("reserved LZW flag bits set")
    if not 9 <= maxbits <= 16:
        raise ValueError(f"invalid LZW max code width {maxbits}")
    body = data[3:]
    total_bits = len(body) * 8
    CLEAR = 256
    first = 257 if block_mode else 256
    cap = 1 << maxbits
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b""] * (
        cap - 256
    )
    free = first
    nbits = 9
    # Historical bug-compat (pinned against the system uncompress):
    # the width trigger is `free > maxcode`, and maxcode only becomes
    # the never-fires sentinel (1<<maxbits) when a width CHANGE lands
    # on maxbits.  With maxbits == 9 == INIT_BITS no change ever
    # happens, maxcode stays 511, and the one fire at table-full
    # bumps the stream to TEN-bit codes — wider than the declared
    # maxbits.  compress(1) shipped this in the 80s; every decoder
    # (gzip's unlzw included) mirrors it, so we must too.
    maxcode = (1 << nbits) - 1
    pos = 0  # bit offset into the code area
    seg_start = 0  # bit offset where the current constant-width segment began
    prev = -1  # previous code, -1 after (re)start
    out = bytearray()

    def skip_pad(w: int) -> None:
        nonlocal pos, seg_start
        rem = (pos - seg_start) % (w * 8)
        if rem:
            pos += w * 8 - rem
        seg_start = pos

    while True:
        if free > maxcode:
            skip_pad(nbits)
            nbits += 1
            maxcode = (
                (1 << maxbits) if nbits == maxbits else (1 << nbits) - 1
            )
        if pos + nbits > total_bits:
            break
        byte0 = pos >> 3
        chunk = int.from_bytes(body[byte0 : byte0 + 3], "little")
        code = (chunk >> (pos & 7)) & ((1 << nbits) - 1)
        pos += nbits
        if block_mode and code == CLEAR:
            skip_pad(nbits)
            nbits = 9
            maxcode = (1 << nbits) - 1
            free = first
            prev = -1
            continue
        if prev < 0:
            if code > 255:
                raise ValueError(
                    "first LZW code after reset must be a literal"
                )
            entry = table[code]
        elif code < free:
            entry = table[code]
        elif code == free and free < cap:
            # KwKwK: the code being defined by this very step
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"LZW code {code} out of range (free={free})")
        out += entry
        if len(out) > max_output:
            raise ValueError("decompressed output exceeds cap")
        if prev >= 0 and free < cap:
            table[free] = table[prev] + entry[:1]
            free += 1
        prev = code
    return bytes(out)


def encode_lzw(data: bytes, maxbits: int = 16) -> bytes:
    """Produce a ``compress(1)``-compatible ``.Z`` stream (block mode)
    — the fixture/test encoder for ``decode_lzw`` and the WET-chain
    transport variant.  Emits CLEAR when the code table fills so the
    reset path is exercised; cross-pinned against the system
    ``uncompress`` in tests, which is what validates the 8-code
    unit-padding convention both directions."""
    if not 9 <= maxbits <= 16:
        raise ValueError(f"invalid LZW max code width {maxbits}")
    CLEAR = 256
    first = 257
    cap = 1 << maxbits
    head = bytes((LZW_MAGIC[0], LZW_MAGIC[1], 0x80 | maxbits))
    if not data:
        return head
    body = bytearray()
    nbits = 9
    bitbuf = 0
    bitcnt = 0
    seg_bits = 0

    def emit(code: int) -> None:
        nonlocal bitbuf, bitcnt, seg_bits
        bitbuf |= code << bitcnt
        bitcnt += nbits
        seg_bits += nbits
        while bitcnt >= 8:
            body.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    def pad_unit() -> None:
        nonlocal bitcnt, seg_bits
        rem = seg_bits % (nbits * 8)
        if rem:
            bitcnt += nbits * 8 - rem  # zero bits
            while bitcnt >= 8:
                body.append(bitbuf & 0xFF)  # low byte is already 0-padded
                _drop()
        seg_bits = 0

    def _drop() -> None:
        nonlocal bitbuf, bitcnt
        bitbuf >>= 8
        bitcnt -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    free = first
    # same maxcode state machine as the decoder, including the
    # maxbits==9 bug-compat fire past maxbits (see decode_lzw)
    maxcode = (1 << nbits) - 1
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        # width check AFTER the write, with free still excluding this
        # step's new entry — compress(1)'s output() order; the decoder
        # checks before its NEXT read with the same free value, so
        # both switch between the same two codes
        if free > maxcode:
            pad_unit()
            nbits += 1
            maxcode = (
                (1 << maxbits) if nbits == maxbits else (1 << nbits) - 1
            )
        if free < cap:
            table[wc] = free
            free += 1
        else:
            # table full: CLEAR and start over (real compress gates
            # this on the ratio; any policy decodes identically)
            emit(CLEAR)
            pad_unit()
            nbits = 9
            maxcode = (1 << nbits) - 1
            table = {bytes([i]): i for i in range(256)}
            free = first
        w = c
    emit(table[w])
    if bitcnt:
        body.append(bitbuf & 0xFF)
    return head + bytes(body)


def decode_content_coding(coding: str, body: bytes) -> bytes:
    """Decode ONE content-coding token (the WARC layer walks the
    chain right-to-left per RFC 9110 §8.4)."""
    c = coding.strip().lower()
    if c in ("", "identity"):
        return body
    if c in ("gzip", "x-gzip"):
        return zlib.decompress(body, wbits=zlib.MAX_WBITS | 16)
    if c == "deflate":
        try:
            return zlib.decompress(body)
        except zlib.error:
            return zlib.decompress(body, wbits=-zlib.MAX_WBITS)
    if c == "br":
        return brotli_decompress(body)
    if c == "zstd":
        return zstd_decompress(body)
    if c in ("compress", "x-compress"):
        return decode_lzw(body)
    raise NotImplementedError(
        f"content-encoding {c!r} requires libraries not present"
    )


# ---------------------------------------------------------------------------
# transform-table learning (build-time utility; see module docstring)
# ---------------------------------------------------------------------------


def _candidate_transforms(
    word: bytes, ref: bytes, pos: int, max_fix: int = 12
) -> list[tuple[bytes, str, bytes]]:
    """All (prefix, op, suffix) triples LOCALLY consistent with the
    reference output at ``pos``: prefix + op(word) must equal the
    reference bytes there.  The TRUE transform is always in this set,
    which is what makes intersecting the sets across instances a
    sound learning rule."""
    cands = []
    seen = set()
    for op_name, op in TRANSFORM_OPS.items():
        ow = op(word)
        for plen in range(0, max_fix + 1):
            end = pos + plen + len(ow)
            if end > len(ref):
                break
            if ref[pos + plen:end] != ow:
                continue
            prefix = bytes(ref[pos:pos + plen])
            for slen in range(0, max_fix + 1):
                if end + slen > len(ref):
                    break
                t = (prefix, op_name, bytes(ref[end:end + slen]))
                if t not in seen:
                    seen.add(t)
                    cands.append(t)
    # Occam order: true transforms carry the SHORTEST fix text — the
    # degenerate alternatives (a literal prefix spelling out half the
    # word over an omit_first) need long fixes, and trying them first
    # poisons the DFS with wrong-length parses
    cands.sort(
        key=lambda t: (len(t[0]) + len(t[2]), t[1] != "identity", t[1])
    )
    return cands


def _solve_stream(
    data: bytes,
    ref: bytes,
    table: dict,
    constraints: dict | None,
    depth: int = 0,
) -> dict | None:
    """Depth-first search for a transform assignment under which the
    stream decodes EXACTLY to ``ref``.  With ``constraints`` given,
    every unknown-id encounter first INTERSECTS the id's global
    candidate set with the local candidates (sound — see
    ``_candidate_transforms``), then branches.  Returns the per-stream
    assignment or None."""
    if depth > 24:
        return None
    try:
        out = decode_brotli(data, transforms=table, _expected=ref)
    except BrotliTransformGap as g:
        local = _candidate_transforms(g.word, ref, g.out_pos)
        tid = g.transform_id
        if constraints is None:
            inter = local
        elif tid in constraints:
            lset = set(local)
            inter = [c for c in constraints[tid] if c in lset]
            constraints[tid] = inter
        else:
            constraints[tid] = local
            inter = local
        for cand in inter:
            r = _solve_stream(
                data, ref, {**table, tid: cand}, constraints, depth + 1
            )
            if r is not None:
                return {tid: cand, **r}
        return None
    except BrotliError:
        return None
    return {} if out == ref else None


def learn_transforms(
    texts: list[bytes] | None = None,
    levels: tuple = (4, 5, 6, 7, 8, 9, 10, 11),
) -> tuple[dict, dict]:
    """Recover RFC 7932 dictionary transforms EMPIRICALLY: compress
    probe texts with the Arrow brotli encoder, and for every stream
    that references an unknown transform, recover the (prefix, op,
    suffix) triple in two sound phases:

    1. LOCAL-VIABILITY VOTES — at every encounter on a VALIDATED
       replay, each triple whose ``prefix + op(word)`` matches the
       reference output at that position gets a vote (the true triple
       is locally viable at every correctly parsed instance; strict
       intersection is unsound here because an alternative
       wrong-length parse can mislabel later (id, word) pairs);
    2. GLOBAL VALIDATION over the top vote tier — a candidate
       survives only if EVERY probe stream where that id was the
       single unknown decodes to exact byte equality with the Arrow
       decode under it (this is what separates "suffix is a space"
       from "the space comes from the next command" — both are
       locally viable, only one replays the whole stream).

    An id is promoted only when exactly one candidate survives —
    nothing is ever guessed; ids the encoder never exercised (or that
    stay ambiguous) remain absent and keep raising the loud gap.
    This is a BUILD-TIME utility: its output ships as
    ``data/brotli_transforms_learned.json`` and is regenerated /
    revalidated by ``tests/test_encodings.py``."""
    codec = _arrow_codec("brotli")
    if codec is None:
        raise RuntimeError("learning needs the Arrow brotli codec")
    if texts is None:
        texts = _default_probe_texts()
    import pyarrow as pa

    samples = []
    for t in texts:
        for lvl in levels:
            buf = pa.Codec("brotli", compression_level=lvl).compress(t)
            samples.append(
                (bytes(buf.to_pybytes() if hasattr(buf, "to_pybytes")
                       else buf), t)
            )
    learned = {0: (b"", "identity", b"")}
    constraints: dict = {}
    by_tid: dict = {}  # tid -> [sample idx where tid was the ONLY unknown]
    # phase 1: solve, then intersect constraints on a REPLAY of the
    # found assignment — inside the speculative DFS the output prefix
    # at a nested gap may be wrong, so intersecting there silently
    # drops true triples (found when ids 27/56 went empty); on the
    # replay every gap's prefix is byte-correct by construction
    for idx, (data, ref) in enumerate(samples):
        a = _solve_stream(data, ref, learned, None)
        if a is None:
            continue
        if len(a) == 1:
            by_tid.setdefault(next(iter(a)), []).append(idx)
        table = dict(learned)
        while True:
            try:
                decode_brotli(data, transforms=table, _expected=ref)
                break
            except BrotliTransformGap as g:
                local = _candidate_transforms(g.word, ref, g.out_pos)
                tid = g.transform_id
                # SUPPORT VOTE, not strict intersection: a wrong
                # early pin with a different expansion length yields
                # an alternative self-consistent parse whose later
                # gaps carry MISLABELED (id, word) pairs — one such
                # instance would empty a strict intersection.  The
                # true triple tops the vote because correct parses
                # dominate; the exact global-validation phase below
                # is the actual promotion gate.
                votes = constraints.setdefault(tid, {})
                for c in local:
                    votes[c] = votes.get(c, 0) + 1
                table[tid] = a[tid]
    # phase 2: EXACT global validation over the top vote-getters, to
    # a fixpoint (resolving one id can unlock another's samples); a
    # candidate survives only if every stream where the id was the
    # single unknown replays byte-exactly under it
    survivors_by_tid: dict = {}
    for _round in range(6):
        progress = False
        for tid, votes in sorted(constraints.items()):
            if tid in learned or not by_tid.get(tid):
                continue
            # the true triple is locally viable at every CORRECTLY
            # parsed instance; a handful of alternative-parse
            # instances can rob it of a few votes, so validate the
            # ≥80%-of-max tier rather than the exact tie (wrong
            # candidates die on their first sample, so the early-exit
            # keeps this ~one solve per candidate)
            top = max(votes.values())
            ranked = sorted(
                (c for c, v in votes.items() if v >= 0.8 * top),
                key=lambda t: (len(t[0]) + len(t[2]), t[1]),
            )[:400]
            survivors = []
            for cand in ranked:
                trial = {**learned, tid: cand}
                if all(
                    _solve_stream(
                        samples[i][0], samples[i][1], trial, None
                    )
                    is not None
                    for i in by_tid[tid]
                ):
                    survivors.append(cand)
            survivors_by_tid[tid] = survivors
            if len(survivors) == 1:
                learned[tid] = survivors[0]
                progress = True
        if not progress:
            break
    # final validation: with the promoted table, every probe stream
    # decodes EXACTLY or gaps on a still-unresolved id
    for data, ref in samples:
        try:
            got = decode_brotli(data, transforms=learned)
        except BrotliTransformGap:
            continue
        if got != ref:
            raise RuntimeError(
                "learned transform table failed final validation"
            )
    unresolved = {
        t: survivors_by_tid.get(t, sorted(v, key=v.get, reverse=True)[:6])
        for t, v in constraints.items()
        if t not in learned
    }
    return learned, unresolved


def _default_probe_texts() -> list[bytes]:
    """Deterministic TINY probes (1-4 words, heavily decorated): small
    inputs are where the encoder reaches for dictionary transforms
    hardest, and a reference at output offset ~0 makes each candidate
    trial O(bytes) — the whole learning pass runs in seconds.  Head /
    tail variety is what powers the constraint intersection: the same
    transform id must replay byte-exactly in many different contexts."""
    import random

    words = [
        "the", "information", "description", "available", "development",
        "different", "important", "companies", "world", "people", "work",
        "during", "something", "question", "service", "through",
        "because", "president", "government", "university", "technology",
        "community", "experience", "everything", "management",
        "international", "production", "understand", "performance",
        "education", "children", "security", "american", "between",
        "business", "computer", "download", "software", "language",
        "necessary", "particular", "television", "generation",
    ]
    decos = [
        "{}", "{}.", "{} ", " {}", "{},", '"{}"', "({})", "The {} is",
        "{} of the", "{}'s", "<{}>", "{}:", "{}s", "{}ed", "{}ing",
        "[{}]", "{};", "{}\n", ".{}", "{} the", "a {}", "{} a", "e {}",
        "s {}", ", {}", "{} in", "{} to", "{} and", "{} as", "{} at",
        "{} by", "{} on", "{} for", "{} with", "{} from", "{} that",
        "{}. The", "{}, and", "{} =", "{}=\"", "{}.com", "{}. This",
        "{} is", "{} was", "{} not", "{}er", "{}al", "{}ful", "{}ive",
        "{}less", "{}est", "{}ize", "{}ous", "{}ly",
        # capitalization / uppercase contexts with varied neighbors —
        # what disambiguates the ferment family from literal-prefix
        # omit coincidences
        "The {} q", "The {}9", "A {} z", "THE {} j", "Z {} X",
        "Q. The {} x", "{} The", ". {} .", "? {}!", "' {}'",
        "{}=", "-{}", "{} -", "{})", "{}(", "{}\"", "{}>", "{}]",
        "{}'", "{} it", "{} of", "{} an", "{}\'t",
        # connective-suffix contexts (the transform table's suffix
        # pool is dominated by function words)
        "{} will", "{} would", "{} were", "{} their", "{} can",
        "{} had", "{} his", "{} her", "{} all", "{} when", "{} who",
        "{} more", "{} are", "{} be", "{} which", "{} has",
        "{} have", "{} this", "{} or", "{} but", "{} said",
        "{} one", "{} you", "{} we", "{} they", "{} she", "{} he",
        "{} its", "{} my", "{} time", "{} there", "{} about",
        "{} out", "{} up", "{} what", "{} them", "{} some",
        "{} so", "{} no", "{} if", "{} would q", "{} will q",
        "{}\nq", "{}\nZ", "{}. q", "{}, q",
        "{} a q", "{} a z9", "{}, jj", "{}, Zx", "{}.<q", "{}.</p>",
        '{}."', "{}.'", "{} a detailed", "{}, and zz",
    ]
    heads = ["", "q ", "9 ", "Z", "jj ", "~", "X:", "..", "0"]
    tails = ["", " qqq", " Zx9", "!", "?", " 42", "zzz", " KJH", "~",
             " #", "Q", " jj", "99"]
    rng = random.Random(5)
    texts = set()
    for w in words:
        for deco in decos:
            for _ in range(2):
                h = rng.choice(heads)
                t = rng.choice(tails)
                texts.add((h + deco.format(w) + t).encode())
        # capitalized / uppercased forms with NO following space and
        # varied next bytes — what separates the bare-ferment ids
        # (e.g. 9) from their space-suffixed siblings (e.g. 4)
        for t in tails:
            texts.add((w.capitalize() + t).encode())
            texts.add((rng.choice(heads) + w.capitalize() + t).encode())
            texts.add((w.upper() + t).encode())
    return sorted(texts)
