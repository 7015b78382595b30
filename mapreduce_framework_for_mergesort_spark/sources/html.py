"""HTML→text extraction + charset decoding — the "WET" step (round 10).

Round 9 taught the engine to read a crawl (``sources/warc.py``); this
module turns what it reads into the ``documents.text`` column every
downstream operator consumes.  For real Common Crawl ``response``
records the pipeline is exactly the one Common Crawl's WET derivative
runs: HTTP message split → transfer/content decoding → charset
detection → byte→str decode → tag stripping to visible text.  All of
it on the stdlib (``html.parser``, ``codecs``, ``zlib`` via
``sources/warc.py``) — consistent with the package's
no-external-libraries discipline.

Pieces (each independently testable, composed by the Arrow pass):

* ``sniff_charset`` — WHATWG-style detection order: BOM (utf-32 before
  utf-16 before utf-8 — the 2-byte utf-16 marks prefix the 4-byte
  utf-32 ones), ``Content-Type`` header ``charset=`` parameter,
  ``<meta charset>`` / ``<meta http-equiv>`` sniff over the first 1024
  bytes, utf-8 fallback.  Labels are validated through
  ``codecs.lookup``; a junk label falls through to the next source
  (crawls are full of ``charset=yes`` — a loud error here would
  quarantine text that decodes fine as utf-8).
* ``html_to_text`` — visible-text extraction on ``html.parser``:
  script/style/template/noscript subtrees dropped, character/entity
  references decoded (``convert_charrefs``), block-level boundaries
  become newlines, whitespace runs inside a block collapse to one
  space (the HTML rendering rule, and the normal form the engine's
  text operators expect).  Never raises: tag soup is still text —
  malformed HTML is NOT a quarantine case (contrast the byte-level
  parsers, where structural damage is loud).
* ``audit_http_extractions`` — the distributed operator: one Arrow
  pass over ``read_warc`` output classifying every ``response`` record
  ``ok | corrupt | unsupported_encoding | non_200 | non_text`` with its reason,
  status, content-encoding, mime, charset, and (when ok) the extracted
  text.  br/zstd bodies DECODE as of round 11 (``sources/encodings.py``
  — house RFC 7932 decoder + Arrow codecs); genuinely unknown
  content-encodings land in ``unsupported_encoding``
  with a count a crawl audit can report, instead of raising per-record
  in user code (round-9 verdict item 4).
* ``warc_responses_to_documents`` — the clean feed:
  ``audit_http_extractions`` filtered to ``extract_ok`` projected to
  ``(url, mime, charset, text, warc_file, record_idx)``, ready for
  ``pipelines.curate_documents``.
* ``synthesize_html`` / ``synthesize_http_response`` /
  ``html_crawl_shard_bytes`` — the deterministic fixture half: a
  documents table republished as a crawl of HTTP ``response`` records
  whose pages vary charset (utf-8 via <meta>, latin-1 via header
  param, utf-16 via BOM) and transport (identity/gzip/chunked/both) by
  doc_id, while the EXTRACTED text stays the closed form
  ``expected_extracted_text(doc_id, text)`` a SQL oracle recomputes —
  the ``warc_http`` branch of ``q_source_roundtrips`` hash-checks the
  whole chain per document (the md5-of-extracted-text group key makes
  the aggregate exact at document grain).

100 TB posture: extraction is a map-only Arrow pass over the
``read_warc`` fan-out (one crawl file = one task; no shuffle anywhere
in the chain until the caller aggregates); the raw payload column is
projected away in the same pass, so only the fixed-width audit columns
plus the extracted text survive upstream of any exchange.

Reference parity note: the reference engine (``/root/reference``,
``NodeHandler.java:44-75``) ingests line-delimited text only; this is
part of the LLM-curation surface the brief layers on top.
"""

from __future__ import annotations

import codecs
import html as _html_mod
import re
from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapreduce_framework_for_mergesort_spark.sources import warc as W

# ---------------------------------------------------------------------------
# charset detection
# ---------------------------------------------------------------------------

#: <meta charset="..."> / <meta http-equiv="Content-Type"
#: content="text/html; charset=..."> — one pattern catches both forms.
_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,512}?charset\s*=\s*[\"']?([A-Za-z0-9._:-]{1,40})",
    re.IGNORECASE,
)

_CHARSET_PARAM_RE = re.compile(
    r"charset\s*=\s*\"?([A-Za-z0-9._:-]{1,40})", re.IGNORECASE
)


def _valid_codec(label: str | None) -> str | None:
    if not label:
        return None
    try:
        codecs.lookup(label)
    except LookupError:
        return None
    return label


def sniff_charset(content_type: str | None, body: bytes) -> tuple[str, str]:
    """Detect the charset of an HTML byte payload →
    ``(codec_label, origin)`` with origin in ``bom | header | meta |
    default``.  Detection order is the WHATWG one (BOM beats headers
    beats meta beats fallback); unknown labels fall through to the
    next source instead of raising — a crawl's ``charset=junk`` is
    data noise, not structural damage."""
    if body[:4] in (b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"):
        return "utf-32", "bom"
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # the utf-16/utf-32 stdlib codecs consume their own BOM and
        # pick the endianness from it
        return "utf-16", "bom"
    if body[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig", "bom"
    if content_type:
        m = _CHARSET_PARAM_RE.search(content_type)
        if m and _valid_codec(m.group(1)):
            return m.group(1), "header"
    m = _META_CHARSET_RE.search(body[:1024])
    if m:
        label = m.group(1).decode("latin-1")
        if _valid_codec(label):
            return label, "meta"
    return "utf-8", "default"


def decode_html_bytes(content_type: str | None, body: bytes) -> tuple[str, str]:
    """Bytes → str through the detected charset, ``errors='replace'``
    (mojibake beats a dead 100 TB job — the WET convention; the
    replacement characters are then visible to quality filters
    downstream).  Returns ``(text, charset_label)``."""
    label, _origin = sniff_charset(content_type, body)
    try:
        return body.decode(label, errors="replace"), label
    except Exception:
        # a label codecs.lookup accepts can still fail to decode bytes
        # (str-to-str codecs); fall back rather than die
        return body.decode("utf-8", errors="replace"), "utf-8"


# ---------------------------------------------------------------------------
# visible-text extraction
# ---------------------------------------------------------------------------

#: Subtrees whose text is never visible content.
_SKIP_TAGS = {"script", "style", "template", "noscript"}

#: Tags that end the current text run (HTML block-level display, plus
#: the few head elements that carry visible-ish text of their own).
_BLOCK_TAGS = {
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "dd", "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hr", "html", "li", "main", "nav", "ol", "option", "p", "pre",
    "section", "summary", "table", "tbody", "td", "tfoot", "th", "thead",
    "title", "tr", "ul",
}


class _TextExtractor(HTMLParser):
    """Streaming visible-text collector; whitespace normal form is
    decided per BLOCK (collapse runs, strip, drop empties) so the
    output is deterministic regardless of how the source formats its
    markup."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._lines: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):  # noqa: D401
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BLOCK_TAGS:
            self.flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            # max(0, ...): tag soup may close what never opened
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS:
            self.flush()

    def handle_data(self, data):
        if not self._skip and data:
            self._buf.append(data)

    def flush(self) -> None:
        line = " ".join("".join(self._buf).split())
        if line:
            self._lines.append(line)
        self._buf = []

    def text(self) -> str:
        self.flush()
        return "\n".join(self._lines)


class _LinkExtractor(HTMLParser):
    """Collects ``<a href>`` targets (and ``<link rel=canonical>``)
    outside skipped subtrees — the out-link half of a crawl page, the
    input to the domain link graph (``operators/urls.py``)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.hrefs: list[str] = []
        self.canonicals: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
        elif tag == "link":
            d = dict(attrs)
            # valueless attrs (``<link rel href=...>``) reach here as
            # None from HTMLParser — coalesce before .lower()
            if (d.get("rel") or "").lower() == "canonical" and d.get("href"):
                self.hrefs.append(d["href"])
                self.canonicals.append(d["href"])

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)


def extract_links(markup: str, base_url: str | None = None) -> list[str]:
    """``<a href>`` / canonical targets of a page, in document order,
    resolved against ``base_url`` when given (stdlib ``urljoin`` —
    relative hrefs are the common case in real pages), filtered to
    http(s) (mailto:/javascript:/fragment-only links are page chrome,
    not graph edges).  Duplicates preserved — edge WEIGHT is signal;
    the graph builder aggregates."""
    from urllib.parse import urljoin

    p = _LinkExtractor()
    p.feed(markup)
    p.close()
    out = []
    for href in p.hrefs:
        if href.startswith("#"):
            # fragment-only href: urljoin would resolve it to the page
            # itself — an in-page anchor, not a graph edge
            continue
        url = urljoin(base_url, href) if base_url else href
        if url.startswith(("http://", "https://")):
            out.append(url)
    return out


def extract_canonical(markup: str, base_url: str | None = None) -> str | None:
    """The page's declared canonical URL (first ``<link
    rel=canonical>``, resolved against ``base_url``), or None.  The
    standard crawl-dedup signal: a page that POINTS at a canonical is
    a declared duplicate of it — ``urls.dedup_by_url`` over
    ``coalesce(canonical, url)`` collapses the family even when the
    variant URLs don't normalize to each other."""
    from urllib.parse import urljoin

    p = _LinkExtractor()
    p.feed(markup)
    p.close()
    for href in p.canonicals:
        url = urljoin(base_url, href) if base_url else href
        if url.startswith(("http://", "https://")):
            return url
    return None


PAGE_CANONICAL_SCHEMA = "url string, canonical_url string"


def page_canonicals(records: DataFrame) -> DataFrame:
    """Distributed canonical extraction over ``read_warc`` output:
    ``(url, canonical_url)`` with ``canonical_url = url`` for pages
    declaring none — the join-ready shape for collapsing a crawl to
    canonical grain (``urls.dedup_by_url(..., url_col=
    'canonical_url')``).  Same decode chain as the link extractor;
    quarantined records contribute zero rows."""
    resp = records.where(F.col("warc_type") == "response")

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            canon: list[str] = []
            for uri, payload in zip(pdf["target_uri"], pdf["payload"]):
                markup = _classify_and_extract_html(bytes(payload))
                if markup is None:
                    continue
                try:
                    # tag-soup wild pages must quarantine, not kill
                    # the Arrow task (module contract)
                    c = extract_canonical(markup, uri)
                except Exception:
                    continue
                urls.append(uri)
                canon.append(c or uri)
            yield pd.DataFrame({"url": urls, "canonical_url": canon})

    return resp.mapInPandas(ex, PAGE_CANONICAL_SCHEMA)


PAGE_LINK_SCHEMA = "url string, link string"


def extract_page_links(records: DataFrame) -> DataFrame:
    """Distributed out-link extraction over ``read_warc`` output: the
    same classify-and-decode chain as ``audit_http_extractions``, but
    fanned out one row per (page, resolved link) — the edge list a
    link graph / domain-authority pass consumes.  Map-only Arrow pass
    (``mapInPandas`` because the fan-out is one-to-many); quarantined
    records contribute zero edges, they never kill the pass."""
    resp = records.where(F.col("warc_type") == "response")

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            links: list[str] = []
            for uri, payload in zip(pdf["target_uri"], pdf["payload"]):
                row = _classify_and_extract_html(bytes(payload))
                if row is None:
                    continue
                try:
                    page_links = extract_links(row, base_url=uri)
                except Exception:
                    continue  # quarantine, never kill the pass
                for link in page_links:
                    urls.append(uri)
                    links.append(link)
            yield pd.DataFrame({"url": urls, "link": links})

    return resp.mapInPandas(ex, PAGE_LINK_SCHEMA)


def _classify_and_extract_html(payload: bytes) -> str | None:
    """Markup (pre-tag-strip str) of an ok HTML 200, else None — the
    decode front end of link extraction.  Links live in the tags
    ``_classify_and_extract`` strips, so this stops one step earlier
    in the same chain; quarantine classes all map to None (counted by
    the audit operator, not here)."""
    try:
        status, headers, raw = W._http_split(payload)
        body = W._decode_http_body(headers, raw)
    except (ValueError, NotImplementedError):
        return None
    if status != 200:
        return None
    ctype = headers.get("content-type", "")
    mime = ctype.split(";", 1)[0].strip().lower() or None
    if mime is not None and "html" not in mime:
        return None
    markup, _charset = decode_html_bytes(ctype, body)
    return markup


def html_to_text(markup: str) -> str:
    """HTML → visible text: script/style/template/noscript dropped,
    entities decoded, block boundaries → ``\\n``, whitespace runs
    inside a block collapsed to single spaces, blocks stripped, empty
    blocks dropped.  Tolerant by design (``html.parser`` recovers from
    tag soup): malformed HTML is still text, so unlike the byte-level
    container parsers this never raises on bad input."""
    p = _TextExtractor()
    p.feed(markup)
    p.close()
    return p.text()


# ---------------------------------------------------------------------------
# deterministic fixtures: page + HTTP response + crawl sink
# ---------------------------------------------------------------------------


def expected_extracted_text(doc_id: int, text: str) -> str:
    """The closed form ``html_to_text`` recovers from
    ``synthesize_html(doc_id, text)`` — mirrored literally by the SQL
    oracle of the ``warc_http`` branch.  The ``±`` (U+00B1) marker
    encodes differently in each fixture charset, so a wrong charset
    decision breaks the hash, not just a diacritic."""
    title = f"doc {doc_id} ± crawl"
    heading = f"heading {doc_id}"
    return f"{title}\n{heading}\n{text}" if text else f"{title}\n{heading}"


def synthesize_html(
    doc_id: int, text: str, charset: str = "utf-8", with_meta: bool = True
) -> bytes:
    """Deterministic HTML page whose VISIBLE text is exactly
    ``expected_extracted_text(doc_id, text)``: title + heading +
    escaped body paragraph, plus the invisible matter a real page
    carries (style rules, a script whose string literal contains
    markup, a comment) so extraction is tested against content that
    must NOT leak through."""
    esc = _html_mod.escape(text or "")
    meta = f'<meta charset="{charset}">' if with_meta else ""
    page = (
        "<!DOCTYPE html><html><head>"
        f"{meta}"
        f"<title>doc {doc_id} ± crawl</title>"
        "<style>body { margin: 0; /* <p>styles are not text</p> */ }</style>"
        '<script type="text/javascript">var trap = "<p>not text</p>";'
        "</script></head><body>"
        f"<h1>heading   {doc_id}</h1>"
        "<!-- comments are not text -->"
        f"<p>{esc}</p>"
        "<noscript>fallback is skipped</noscript>"
        "</body></html>"
    )
    return page.encode(charset)


def synthesize_http_response(
    body: bytes,
    content_type: str = "text/html",
    content_encoding: str | None = None,
    chunked: bool = False,
    status: int = 200,
    chunk_size: int = 100,
) -> bytes:
    """Deterministic ``application/http; msgtype=response`` payload:
    optional content-coding (stored deflate with closed-form sizes;
    br/zstd via the Arrow codecs — round 11 closed that seam), then
    optional chunked transfer-coding — the RFC 9112 composition order
    ``http_response_body`` must invert."""
    if content_encoding in ("gzip", "x-gzip"):
        body = W._gzip_member_stored(body)
    elif content_encoding == "deflate":
        import zlib

        body = zlib.compress(body, 0)
    elif content_encoding in ("br", "zstd"):
        import pyarrow as pa

        buf = pa.Codec(
            "brotli" if content_encoding == "br" else "zstd"
        ).compress(body)
        body = bytes(
            buf.to_pybytes() if hasattr(buf, "to_pybytes") else buf
        )
    elif content_encoding in ("compress", "x-compress"):
        from . import encodings as _enc

        body = _enc.encode_lzw(body)
    elif content_encoding not in (None, "identity"):
        # fixtures for the quarantine tests: emit the header, keep the
        # (undecodable) body bytes as-is
        pass
    headers = [f"HTTP/1.1 {status} OK", f"Content-Type: {content_type}"]
    if content_encoding and content_encoding != "identity":
        headers.append(f"Content-Encoding: {content_encoding}")
    if chunked:
        headers.append("Transfer-Encoding: chunked")
        chunks = [
            body[i : i + chunk_size] for i in range(0, len(body), chunk_size)
        ]
        body = (
            b"".join(
                b"%x\r\n" % len(c) + c + b"\r\n" for c in chunks
            )
            + b"0\r\n\r\n"
        )
    else:
        headers.append(f"Content-Length: {len(body)}")
    head = "\r\n".join(headers).encode("latin-1")
    return head + b"\r\n\r\n" + body


#: Fixture variant tables, keyed by doc_id arithmetic so the layout is
#: deterministic AND every combination appears at any corpus size ≥ 12.
#: charset by doc_id % 3 — (codec, content-type header, page carries
#: its own <meta charset>): utf-8 found via meta sniff, latin-1 via
#: header parameter, utf-16 via BOM (no meta, no header param).
_CHARSET_VARIANTS = [
    ("utf-8", "text/html", True),
    ("latin-1", "text/html; charset=ISO-8859-1", False),
    ("utf-16", "text/html", False),
]
#: transport by doc_id % 8: (content_encoding, chunked) — round 11
#: added the br/zstd variants when ``sources/encodings.py`` closed
#: that decode seam; round 12 adds LZW ``compress`` (the .Z coding),
#: so the WET-chain key proves all of them end-to-end
_TRANSPORT_VARIANTS = [
    (None, False),
    ("gzip", False),
    (None, True),
    ("gzip", True),
    ("br", False),
    ("zstd", False),
    ("br", True),
    ("compress", False),
]


def crawl_url(doc_id: int) -> str:
    return f"http://crawl.test/doc/{doc_id}"


def _response_record_payload(doc_id: int, text: str) -> bytes:
    enc, chunked = _TRANSPORT_VARIANTS[doc_id % 8]
    if doc_id % 5 == 2:
        # round 12: one doc in five is an application/pdf page whose
        # extracted text is the SAME closed form as the HTML pages —
        # the oracle's expectation is format-agnostic, so the hash pin
        # proves the whole sources/pdf.py chain (filters, xref
        # layouts, fonts vary by doc_id inside synthesize_pdf)
        from . import pdf as P

        return synthesize_http_response(
            P.synthesize_pdf(doc_id, text),
            content_type="application/pdf",
            content_encoding=enc,
            chunked=chunked,
        )
    charset, ctype, with_meta = _CHARSET_VARIANTS[doc_id % 3]
    page = synthesize_html(doc_id, text, charset=charset, with_meta=with_meta)
    return synthesize_http_response(
        page, content_type=ctype, content_encoding=enc, chunked=chunked
    )


def html_crawl_shard_bytes(
    documents: DataFrame, n_shards: int = 8
) -> DataFrame:
    """Documents → ``.warc.gz`` shard blobs of HTTP ``response``
    records (the raw-crawl layout, vs ``warc_shard_bytes``'s
    conversion-style ``resource`` records): each document becomes one
    deterministic HTML page behind one HTTP response whose charset and
    transport vary by doc_id.  Same executor-side build discipline as
    ``warc_shard_bytes`` — bytes never on the driver — and (round 12,
    optimization) the same TWO-PHASE build: page synthesis +
    per-record gzip-member encoding is a pure function of (doc_id,
    text), so it runs at full input parallelism, and the shard task
    only concatenates members in doc_id order (byte-identical output;
    before, synthesis parallelism was n_shards — 4 at fixture scale)."""

    def build_member(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            members = [
                W._gzip_member_stored(
                    W._record_bytes(
                        "response",
                        crawl_url(int(doc_id)),
                        _response_record_payload(int(doc_id), text or ""),
                    )
                )
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(
                {
                    "__shard": pdf["__shard"].astype("int32"),
                    "doc_id": pdf["doc_id"],
                    "member": members,
                }
            )

    members = W._fan_out_members(documents, n_shards).mapInPandas(
        build_member, "__shard int, doc_id bigint, member binary"
    )
    return W._assemble_shards(members, n_shards)


# Record content-type override for html_crawl_shard_bytes' records:
# synthesize_warc stamps every record "text/plain"; response records
# should carry the application/http type.  Rather than fork the
# synthesizer, read_warc consumers key on warc_type — and the audit
# below accepts both, because real crawls are sloppy here too.


# ---------------------------------------------------------------------------
# the distributed extraction operator
# ---------------------------------------------------------------------------

HTTP_EXTRACT_SCHEMA = (
    "warc_file string, record_idx int, url string, http_status int, "
    "mime string, content_encoding string, charset string, "
    "extract_ok boolean, extract_class string, extract_err string, "
    "text string"
)


#: 200-response mimes whose bodies ARE text once charset-decoded.
#: text/* plus the structured-text application types crawls carry;
#: everything else (image/*, application/pdf, octet-stream, fonts,
#: archives) is binary — decoding it to str would manufacture mojibake
#: documents.
_TEXTUAL_MIME_RE = re.compile(
    r"^text/|([+/](html|xml|json)$)|^application/(xml|json|javascript|"
    r"x-javascript|ecmascript|xhtml)"
)


def _is_textual_mime(mime: str) -> bool:
    return bool(_TEXTUAL_MIME_RE.search(mime))


def _classify_and_extract(payload: bytes) -> dict:
    """One record's extraction, classified — the single-row kernel of
    ``audit_http_extractions`` (unit-testable without Spark)."""
    out = {
        "http_status": None, "mime": None, "content_encoding": "identity",
        "charset": None, "extract_ok": False, "extract_class": None,
        "extract_err": None, "text": None,
    }
    try:
        status, headers, raw = W._http_split(payload)
    except ValueError as ex:
        out["extract_class"] = "corrupt"
        out["extract_err"] = str(ex)[:300]
        return out
    out["http_status"] = status
    ctype = headers.get("content-type", "")
    out["mime"] = ctype.split(";", 1)[0].strip().lower() or None
    enc = headers.get("content-encoding", "").lower() or "identity"
    out["content_encoding"] = enc
    try:
        body = W._decode_http_body(headers, raw)
    except NotImplementedError as ex:
        # br/zstd and friends: a COUNTABLE seam class, not a per-record
        # raise in user code (round-9 verdict item 4)
        out["extract_class"] = "unsupported_encoding"
        out["extract_err"] = str(ex)[:300]
        return out
    except ValueError as ex:
        out["extract_class"] = "corrupt"
        out["extract_err"] = str(ex)[:300]
        return out
    if status != 200:
        # the WET convention: only 200s carry page text worth keeping;
        # redirects/errors are counted, not extracted
        out["extract_class"] = "non_200"
        out["extract_err"] = f"http status {status}"
        return out
    mime = out["mime"]
    if mime == "application/pdf":
        # round 12: PDFs join the clean feed via the stdlib extractor
        # (sources/pdf.py) instead of the non_text quarantine; damage
        # routes to `corrupt` exactly like any codec failure
        from . import pdf as P

        try:
            out["text"] = P.extract_pdf_text(body)
        except ValueError as ex:
            out["extract_class"] = "corrupt"
            out["extract_err"] = str(ex)[:300]
            return out
        out["extract_ok"] = True
        out["extract_class"] = "ok"
        return out
    if mime is not None and not _is_textual_mime(mime):
        # round-10 review: a 200 carrying image/octet-stream bytes
        # must NOT be charset-decoded into mojibake and tagged ok —
        # binary payloads are a countable class of their own, never a
        # text row in the clean feed
        out["extract_class"] = "non_text"
        out["extract_err"] = f"binary mime {mime!r}"
        return out
    text, charset = decode_html_bytes(ctype, body)
    out["charset"] = charset
    if mime is None or "html" in mime:
        # missing content-type on a 200 response: sniffing HTML is the
        # crawl convention (servers lie; bytes don't)
        text = html_to_text(text)
    out["text"] = text
    out["extract_ok"] = True
    out["extract_class"] = "ok"
    return out


def audit_http_extractions(records: DataFrame) -> DataFrame:
    """The WET step as a distributed quarantine-routing operator: one
    Arrow pass over ``read_warc`` output (``response`` records only)
    that runs the full HTTP extraction chain per record and tags every
    row ``extract_class in (ok, corrupt, unsupported_encoding,
    non_200, non_text)`` with status/encoding/mime/charset — so a crawl audit
    reports "N records br, M corrupt, K non-200" in one pass instead
    of dying on the first bad record.  Map-only: no shuffle; the raw
    payload column is projected away here."""
    resp = records.where(F.col("warc_type") == "response")

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                k.split()[0]: [] for k in HTTP_EXTRACT_SCHEMA.split(", ")
            }
            for wf, ri, uri, payload in zip(
                pdf["warc_file"], pdf["record_idx"], pdf["target_uri"],
                pdf["payload"],
            ):
                row = _classify_and_extract(bytes(payload))
                cols["warc_file"].append(wf)
                cols["record_idx"].append(ri)
                cols["url"].append(uri)
                for k in (
                    "http_status", "mime", "content_encoding", "charset",
                    "extract_ok", "extract_class", "extract_err", "text",
                ):
                    cols[k].append(row[k])
            out = pd.DataFrame(cols)
            out["http_status"] = out["http_status"].astype("Int64")
            yield out

    return resp.mapInPandas(ex, HTTP_EXTRACT_SCHEMA)


def warc_responses_to_documents(records: DataFrame) -> DataFrame:
    """The clean feed: crawl ``response`` records → ``(url, mime,
    charset, text, warc_file, record_idx)`` rows ready for
    ``pipelines.curate_documents``.  Quarantined classes (corrupt /
    unsupported_encoding / non_200 / non_text) are filtered here — run
    ``audit_http_extractions`` directly when you need them counted."""
    return audit_http_extractions(records).where(F.col("extract_ok")).select(
        "url", "mime", "charset", "text", "warc_file", "record_idx"
    )
