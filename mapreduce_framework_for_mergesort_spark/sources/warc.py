"""WARC (Web ARChive, ISO 28500) source/sink — round 9.

Web-scale text corpora ship as WARC: Common Crawl alone publishes
~100 TB-scale crawls as ``.warc.gz`` files whose records are
INDIVIDUALLY gzip-compressed and concatenated (the multi-member
convention that makes records independently seekable).  An engine
whose reason to exist is LLM training-data curation needs to READ that
format natively — decompress members, walk the record grammar, surface
payloads as a DataFrame — and usefully to WRITE it back (curated
corpora are republished as WARC for tool compatibility).

Scope mirrors ``sources/containers.py``'s container-layer discipline:

* ``parse_warc`` — the record grammar for real: version line, CRLF
  header block, ``Content-Length``-framed payload, the mandatory
  two-CRLF record terminator; plain AND multi-member-gzip inputs
  (stdlib zlib, wbits=31 member loop).  Structural damage raises
  ``ValueError`` with the byte offset — the same loud, quarantine-
  routable contract every parser in this package keeps (route corrupt
  files through ``containers.audit_payload_parses``-style try/except,
  don't die mid-crawl).
* ``synthesize_warc`` — deterministic fixture/writer: record ids are
  content-derived (sha256 urn), gzip members use STORED deflate so
  byte sizes stay closed-form (the PNG synthesis trick), and the
  emitted stream round-trips through any conformant WARC reader.
* ``read_warc`` — the Spark ingestion path: ``binaryFile`` scan →
  Arrow-batched record fan-out.  100 TB posture: one WARC file is one
  task (the Common Crawl processing convention — files are ~1 GB and
  internally sequential because gzip members must be walked in
  order); parallelism comes from the NUMBER of files (a crawl has
  ~64k), so the scan needs no maxPartitionBytes tuning, and payloads
  are fanned out and projected away before any shuffle.
* ``warc_shard_bytes`` — the sink half: documents → per-shard
  ``.warc.gz`` byte blobs as a DataFrame (deterministic shard
  assignment by doc_id), which the caller persists through any Spark
  writer; bytes never gather on the driver.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"

#: Fixed date for synthesized records — determinism over realism (the
#: engine's fixtures must hash identically across runs; a writer fed
#: real crawl metadata passes real dates per record instead).
WARC_FIXED_DATE = "2026-01-01T00:00:00Z"

WARC_RECORD_SCHEMA = (
    "warc_file string, record_idx int, member_idx int, warc_type string, "
    "record_id string, target_uri string, warc_date string, "
    "content_type string, content_length bigint, payload binary"
)

WARC_SHARD_SCHEMA = "shard_id int, n_records int, n_bytes bigint, data binary"


# ---------------------------------------------------------------------------
# record grammar
# ---------------------------------------------------------------------------


def _record_bytes(
    rtype: str,
    uri: str | None,
    payload: bytes,
    content_type: str = "text/plain",
    date: str = WARC_FIXED_DATE,
) -> bytes:
    """One WARC/1.1 record.  The record id is a content-derived urn so
    synthesis is bit-deterministic (no uuid4/clock)."""
    rid = hashlib.sha256(
        rtype.encode() + b"\x00" + (uri or "").encode() + b"\x00" + payload
    ).hexdigest()
    headers = ["WARC/1.1"]
    headers.append(f"WARC-Type: {rtype}")
    headers.append(f"WARC-Record-ID: <urn:sha256:{rid}>")
    headers.append(f"WARC-Date: {date}")
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"Content-Type: {content_type}")
    headers.append(f"Content-Length: {len(payload)}")
    head = _CRLF.join(h.encode("utf-8") for h in headers)
    return head + _CRLF + _CRLF + payload + _CRLF + _CRLF


def _gzip_member_stored(data: bytes) -> bytes:
    """One gzip member with STORED deflate blocks (level 0): a fully
    valid gzip stream any reader inflates, whose size is the closed
    form ``10 + 5*n_blocks + len + 8`` — same discipline as the PNG
    synthesis' stored-zlib."""
    co = zlib.compressobj(0, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def synthesize_warc(
    records: list[tuple[str, str | None, bytes]],
    gzip_members: bool = True,
) -> bytes:
    """Deterministic WARC stream from ``(warc_type, target_uri,
    payload)`` triples.  ``gzip_members=True`` emits the Common Crawl
    layout — each record its own gzip member, concatenated —
    exercising the member-walk read path; False emits plain WARC."""
    blobs = [_record_bytes(t, u, p) for t, u, p in records]
    if gzip_members:
        return b"".join(_gzip_member_stored(b) for b in blobs)
    return b"".join(blobs)


def _split_gzip_members(payload: bytes) -> list[bytes]:
    """Decompress a multi-member gzip stream member by member (zlib
    wbits=31 + unused_data loop).  Truncated or corrupt members raise
    ValueError with the member index."""
    out = []
    rest = payload
    i = 0
    while rest:
        d = zlib.decompressobj(31)
        try:
            blob = d.decompress(rest)
        except zlib.error as ex:
            raise ValueError(f"corrupt gzip member {i}: {ex}") from None
        if not d.eof:
            raise ValueError(f"truncated gzip member {i}")
        out.append(blob + d.flush())
        rest = d.unused_data
        i += 1
    return out


def _parse_plain_records(data: bytes) -> list[dict]:
    """Walk back-to-back WARC records in uncompressed bytes."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        hdr_end = data.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError(
                f"unterminated WARC header block at offset {pos}"
            )
        head = data[pos:hdr_end].decode("utf-8", errors="strict")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(
                f"record at offset {pos} does not start with a WARC "
                f"version line (got {lines[0][:30]!r})"
            )
        version = lines[0][len("WARC/"):]
        headers: dict[str, str] = {}
        last_key: str | None = None
        for ln in lines[1:]:
            if ln[:1] in (" ", "\t"):
                # folded continuation line (legal in WARC/1.0 via its
                # RFC 2822 header grammar, present in old crawls):
                # extends the PREVIOUS header's value (round-10
                # advisory — rejecting these quarantined whole files
                # conformant readers accept)
                if last_key is None:
                    raise ValueError(
                        f"continuation line {ln!r} before any header "
                        f"at offset {pos}"
                    )
                headers[last_key] += " " + ln.strip()
                continue
            k, sep, v = ln.partition(":")
            if not sep or not k.strip():
                raise ValueError(
                    f"malformed WARC header line {ln!r} at offset {pos}"
                )
            last_key = k.strip().lower()
            headers[last_key] = v.strip()
        if "content-length" not in headers:
            raise ValueError(f"record at offset {pos} has no Content-Length")
        try:
            clen = int(headers["content-length"])
        except ValueError:
            raise ValueError(
                f"non-integer Content-Length {headers['content-length']!r} "
                f"at offset {pos}"
            ) from None
        if clen < 0:
            # int() accepts '-4'; body_end would land back inside the
            # header block and re-match its own CRLFCRLF, silently
            # normalizing a corrupt record to an empty one (round-9
            # review)
            raise ValueError(
                f"negative Content-Length {clen} at offset {pos}"
            )
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError(
                f"record at offset {pos} promises {clen} payload bytes "
                f"+ terminator; stream ends {n - body_start} bytes later"
            )
        if data[body_end : body_end + 4] != _CRLF + _CRLF:
            raise ValueError(
                f"record at offset {pos} missing the two-CRLF terminator"
            )
        records.append(
            {
                "version": version,
                "headers": headers,
                "payload": data[body_start:body_end],
                "offset": pos,
            }
        )
        pos = body_end + 4
    return records


def parse_warc(payload: bytes) -> list[dict]:
    """WARC stream → records (``{version, headers, payload,
    offset}``; header keys lower-cased).  Gzip input (magic
    ``1f 8b``) is walked member by member — each member may carry one
    record (the Common Crawl convention) or several; plain input is
    walked directly.  Every structural deviation raises ValueError."""
    if payload[:2] == b"\x1f\x8b":
        records = []
        for mi, member in enumerate(_split_gzip_members(payload)):
            recs = _parse_plain_records(member)
            for r in recs:
                # offsets are member-relative after decompression; keep
                # the member index so a reader can still seek precisely
                r["member_idx"] = mi
            records.extend(recs)
        return records
    return _parse_plain_records(payload)


# ---------------------------------------------------------------------------
# HTTP message extraction (the "WET" step)
# ---------------------------------------------------------------------------


def _http_split(payload: bytes) -> tuple[int, dict, bytes]:
    """STRUCTURAL half of the HTTP extraction: status line + header
    block parse, raw (still transfer/content-encoded) body returned
    as-is.  Split out of ``http_response_body`` (round 10) so the
    quarantine audit can report a record's content-encoding and status
    even when the DECODE half fails on it."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0:
        raise ValueError("HTTP message has no header terminator")
    head = payload[:sep].decode("latin-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP response status line: {lines[0]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"non-integer HTTP status {parts[1]!r}") from None
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, s, v = ln.partition(":")
        if not s or not k.strip():
            raise ValueError(f"malformed HTTP header line {ln!r}")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4 :]


def _decode_http_body(headers: dict, body: bytes) -> bytes:
    """DECODE half: chunked transfer decoding, then the content-coding
    CHAIN applied right-to-left (RFC 9110 §8.4.1 — codings are listed
    in application order), per RFC 9112 ordering.  Round 11 closes the
    ``br``/``zstd`` seam via ``sources/encodings.py`` (house RFC 7932
    decoder + Arrow codecs); a genuinely unknown coding still raises
    ``NotImplementedError`` (quarantine class unchanged); corrupt
    compressed data raises ValueError (structural-damage class)."""
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    chain = headers.get("content-encoding", "").lower()
    for coding in [c.strip() for c in chain.split(",") if c.strip()][::-1]:
        if coding in ("gzip", "x-gzip"):
            # multi-member streams are legal (servers that flush mid-
            # response emit one member per flush); a plain
            # zlib.decompress(body, 31) would silently return only the
            # FIRST member's text (round-9 review) — keep the member
            # walk rather than encodings.py's single-member gzip
            body = b"".join(_split_gzip_members(body))
        elif coding == "identity":
            continue
        else:
            from . import encodings as _enc

            try:
                body = _enc.decode_content_coding(coding, body)
            except NotImplementedError:
                raise
            except Exception as ex:
                raise ValueError(
                    f"corrupt {coding} body: {ex}"
                ) from None
    return body


def http_response_body(payload: bytes) -> tuple[int, dict, bytes]:
    """Split a WARC ``response`` record's ``application/http`` payload
    into ``(status, headers, body)`` — the extraction that turns a raw
    crawl into usable text (what Common Crawl's WET derivative does).
    Handles the two encodings raw captures actually carry:
    ``Transfer-Encoding: chunked`` (size-line framing decoded exactly;
    trailing headers skipped) and ``Content-Encoding: gzip/deflate``
    (stdlib zlib; applied after de-chunking, per RFC 9112 ordering).
    Unknown content-encodings raise ``NotImplementedError`` (codec
    seam); structural damage — no header terminator, bad status line,
    malformed chunk sizes, truncated chunks — raises ValueError, same
    loud contract as the record grammar."""
    status, headers, raw = _http_split(payload)
    return status, headers, _decode_http_body(headers, raw)


def _dechunk(data: bytes) -> bytes:
    """RFC 9112 chunked transfer decoding: ``<hex-size>[;ext]CRLF
    <chunk>CRLF`` repeated, ``0``-size terminator, optional trailer
    headers ignored.  Exact framing — a size promising bytes past the
    buffer is loud, never clamped."""
    out = []
    pos = 0
    while True:
        nl = data.find(_CRLF, pos)
        if nl < 0:
            raise ValueError(f"chunked body: no size line at offset {pos}")
        size_tok = data[pos:nl].split(b";", 1)[0].strip()
        # int(tok, 16) accepts '-2' / '+2' / '_' separators — a
        # negative size would land the chunk end back on the size
        # line's own CRLF and silently mis-frame the stream (round-9
        # review); hex digits only, per RFC 9112
        if not size_tok or any(
            c not in b"0123456789abcdefABCDEF" for c in size_tok
        ):
            raise ValueError(
                f"chunked body: bad chunk size {size_tok!r} at offset {pos}"
            )
        size = int(size_tok, 16)
        pos = nl + 2
        if size == 0:
            return b"".join(out)  # trailers (if any) intentionally skipped
        end = pos + size
        if end + 2 > len(data):
            raise ValueError(
                f"chunked body: chunk at offset {pos} promises {size} "
                "bytes past the end of the buffer"
            )
        if data[end : end + 2] != _CRLF:
            raise ValueError(
                f"chunked body: chunk at offset {pos} missing its CRLF"
            )
        out.append(data[pos:end])
        pos = end + 2


# ---------------------------------------------------------------------------
# Spark read / sink
# ---------------------------------------------------------------------------


def read_warc(spark, path: str) -> DataFrame:
    """WARC ingestion: ``binaryFile`` scan over ``path`` (glob ok) →
    one Arrow pass fanning each file out to its records.  One file =
    one task (gzip members are sequential; crawl-scale parallelism is
    file-count parallelism), payload column last so downstream
    projections that don't need bytes prune them at the scan above
    this fan-out."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )

    def fan_out(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k.split()[0]: [] for k in WARC_RECORD_SCHEMA.split(", ")
            }
            for path_, content in zip(pdf["path"], pdf["content"]):
                for i, rec in enumerate(parse_warc(bytes(content))):
                    h = rec["headers"]
                    out["warc_file"].append(path_)
                    out["record_idx"].append(i)
                    # the seek contract: which gzip member holds this
                    # record (NULL for plain, non-seekable WARC) —
                    # oracled per record by the warc branch of
                    # q_source_roundtrips (round-9 verdict item 5)
                    out["member_idx"].append(rec.get("member_idx"))
                    out["warc_type"].append(h.get("warc-type"))
                    out["record_id"].append(h.get("warc-record-id"))
                    out["target_uri"].append(h.get("warc-target-uri"))
                    out["warc_date"].append(h.get("warc-date"))
                    out["content_type"].append(h.get("content-type"))
                    out["content_length"].append(len(rec["payload"]))
                    out["payload"].append(rec["payload"])
            df = pd.DataFrame(out)
            df["member_idx"] = df["member_idx"].astype("Int64")
            yield df

    return files.mapInPandas(fan_out, WARC_RECORD_SCHEMA)


def warc_shard_bytes(
    documents: DataFrame, n_shards: int = 8, gzip_members: bool = True
) -> DataFrame:
    """Sink half: documents → ``n_shards`` WARC shard blobs,
    deterministic (shard = doc_id % n_shards; records ordered by
    doc_id inside a shard; content-derived record ids).  Emitted as a
    DataFrame of ``(shard_id, n_records, n_bytes, data)`` so the bytes
    stay distributed — persist with any Spark writer (parquet binary
    column, or a foreachPartition file write where the filesystem
    allows).  The repartition is BY shard_id, so each task builds
    exactly one shard and memory is bounded by shard size — size
    shards accordingly (docs/shard ~ corpus/n_shards).

    Takedown note (round 10): this sink shards whatever DataFrame it
    is given.  Republishing a continuously-ingested corpus is
    takedown-correct only through ``streaming.ingest.read_corpus``
    (the retraction-masked read) — a raw ``spark.read.parquet`` feed
    re-ships retracted documents until the next physical fold (pinned
    in tests/test_warc.py::test_republish_after_takedown...).

    Round 12 (optimization): the build is TWO phases.  Each record's
    bytes are a pure function of its own (doc_id, text) — the record
    id is content-derived and a gzip member is self-contained — so
    per-record member synthesis runs at full input parallelism first,
    and the shard task only concatenates members in doc_id order
    (multi-member gzip = concatenation).  Before, the single
    repartition-by-shard made synthesis parallelism = n_shards (4 at
    fixture scale, on 32 cores); output bytes are identical
    (tests/test_warc.py pins the round-trip, and the two-phase blob is
    byte-equal by construction)."""

    def build_member(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            members = [
                _gzip_member_stored(rec) if gzip_members else rec
                for rec in (
                    _record_bytes(
                        "resource",
                        f"urn:doc:{int(doc_id)}",
                        (text or "").encode("utf-8"),
                    )
                    for doc_id, text in zip(pdf["doc_id"], pdf["text"])
                )
            ]
            yield pd.DataFrame(
                {
                    "__shard": pdf["__shard"].astype("int32"),
                    "doc_id": pdf["doc_id"],
                    "member": members,
                }
            )

    members = _fan_out_members(documents, n_shards).mapInPandas(
        build_member, "__shard int, doc_id bigint, member binary"
    )
    return _assemble_shards(members, n_shards)


def _fan_out_members(documents: DataFrame, n_shards: int) -> DataFrame:
    """Phase-1 input: (doc_id, text, __shard), repartitioned wide when
    the incoming partitioning is below the session's core count (the
    single-file fixture scan is ONE task; at corpus scale the input is
    already wide and this is a no-op check)."""
    from pyspark.sql import functions as F

    sel = documents.select(
        "doc_id",
        "text",
        # pmod, not %: Spark's % is sign-preserving, so a negative
        # doc_id would yield a negative shard_id and a filename
        # like 'shard--001' (round-10 advisory)
        F.pmod(F.col("doc_id"), F.lit(n_shards)).alias("__shard"),
    )
    target = documents.sparkSession.sparkContext.defaultParallelism
    if sel.rdd.getNumPartitions() >= target:
        return sel
    return sel.repartition(target)


def _assemble_shards(members: DataFrame, n_shards: int) -> DataFrame:
    """Phase 2: hash-shuffle members by shard id and concatenate in
    doc_id order — the byte layout ``synthesize_warc`` emits (one gzip
    member per record, records ordered by doc_id).  A task may hold
    several shards (hash collisions) or none; memory is bounded by the
    shards it holds, exactly as the one-phase build was."""

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: dict[int, list] = {}
        for pdf in batches:
            for shard, doc_id, member in zip(
                pdf["__shard"], pdf["doc_id"], pdf["member"]
            ):
                rows.setdefault(int(shard), []).append(
                    (int(doc_id), member)
                )
        out = {"shard_id": [], "n_records": [], "n_bytes": [], "data": []}
        for shard, mems in sorted(rows.items()):
            mems.sort(key=lambda m: m[0])
            blob = b"".join(bytes(m) for _, m in mems)
            out["shard_id"].append(shard)
            out["n_records"].append(len(mems))
            out["n_bytes"].append(len(blob))
            out["data"].append(blob)
        yield pd.DataFrame(out)

    return members.repartition(n_shards, "__shard").mapInPandas(
        assemble, WARC_SHARD_SCHEMA
    )
