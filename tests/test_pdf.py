"""sources/pdf.py: stdlib PDF text extraction, pinned the JPEG/PNG
way — synthesized documents with closed-form expected text, plus
hand-built streams for each §7.4 filter, predictor, xref layout, and
font-encoding path.  No PDF library exists in this container, so the
pins are constructions, not cross-checks (the honesty note lives in
the module docstring)."""

import zlib

import pytest

from mapreduce_framework_for_mergesort_spark.sources import html as H
from mapreduce_framework_for_mergesort_spark.sources import pdf as P


EXPECTED = H.expected_extracted_text


# ---------------------------------------------------------------------------
# the closed-form round trip, every variant axis
# ---------------------------------------------------------------------------


def test_round_trip_all_variant_combinations():
    # moduli 7 (filter), 2 (hex), 13 (TJ), 3 (xref), 11 (Type0) are
    # coprime in pairs that matter; 0..599 hits every combination that
    # the sf fixtures can produce
    for doc_id in range(600):
        text = f"body {doc_id} words" if doc_id % 4 else ""
        exp = EXPECTED(doc_id, text)
        got = P.extract_pdf_text(P.synthesize_pdf(doc_id, text))
        assert got == exp, (doc_id, got, exp)


@pytest.mark.parametrize("filt", sorted(P._CONTENT_FILTERS))
def test_each_content_filter(filt):
    data = P.build_pdf(["alpha line", "beta ± line"], content_filter=filt)
    assert P.extract_pdf_text(data) == "alpha line\nbeta ± line"


@pytest.mark.parametrize("variant", [0, 1, 2])
def test_each_xref_layout(variant):
    data = P.build_pdf(["layout check"], xref_variant=variant)
    assert P.extract_pdf_text(data) == "layout check"
    if variant == 2:
        assert b"/ObjStm" in data
    if variant:
        assert b"/XRef" in data and b"trailer" not in data


def test_type0_identity_h_cjk_and_non_bmp():
    lines = ["汉字测试", "日本語テキスト", "emoji \U0001F600 pair"]
    data = P.build_pdf(lines)  # non-cp1252 forces Type0 + ToUnicode
    assert b"Identity-H" in data
    assert P.extract_pdf_text(data) == "\n".join(lines)


def test_literal_string_escapes_round_trip():
    lines = ["parens (nested (deep))", "back\\slash", "tab\there"]
    for hexs in (False, True):
        data = P.build_pdf(lines, hex_strings=hexs)
        assert P.extract_pdf_text(data) == "\n".join(lines)


def test_empty_middle_line_survives():
    data = P.build_pdf(["a", "", "c"])
    assert P.extract_pdf_text(data) == "a\n\nc"


# ---------------------------------------------------------------------------
# structural robustness
# ---------------------------------------------------------------------------


def test_broken_startxref_rebuilds_by_scan():
    data = P.build_pdf(["rebuild me"])
    assert P.extract_pdf_text(
        data.replace(b"startxref", b"startxrEf")
    ) == "rebuild me"


def test_lying_length_recovers_via_endstream():
    data = P.build_pdf(["length lie"], content_filter="none")
    assert b"/Length " in data
    import re

    bad = re.sub(rb"/Length (\d+)", b"/Length 3", data, count=1)
    assert P.extract_pdf_text(bad) == "length lie"


def test_truncated_and_objectless_raise_value_error():
    data = P.build_pdf(["x"])
    with pytest.raises(ValueError):
        P.extract_pdf_text(data[:100])
    with pytest.raises(ValueError):
        P.extract_pdf_text(b"%PDF-1.4\nno objects here")
    with pytest.raises(ValueError):
        P.extract_pdf_text(b"not a pdf at all")


def test_encrypted_pdf_raises():
    data = P.build_pdf(["secret"])
    with pytest.raises(ValueError, match="encrypt"):
        P.extract_pdf_text(data.replace(b"/Size", b"/Encrypt 99 0 R /Size"))


def test_unsupported_content_filter_raises():
    data = P.build_pdf(["x"], content_filter="none")
    with pytest.raises(ValueError, match="DCTDecode"):
        P.extract_pdf_text(
            data.replace(b"/Contents", b"/Contents", 1).replace(
                b"<</Length", b"<</Filter /DCTDecode /Length", 1
            )
        )


# ---------------------------------------------------------------------------
# filters, unit grain
# ---------------------------------------------------------------------------


def test_lzw_round_trip_with_width_growth_and_reset():
    # >4096 phrases forces 9→12-bit growth AND a table reset
    payload = bytes(
        (i * 7 + (i >> 3)) & 0xFF for i in range(60_000)
    ) + b"the quick brown fox " * 200
    assert P.lzw_decode(P.lzw_encode(payload)) == payload


def test_lzw_decode_rejects_bad_streams():
    with pytest.raises(ValueError):
        # first code after clear must be a literal
        P.lzw_decode(bytes([0b10000001, 0b01000000]))  # 258 first


def test_ascii85_z_shortcut_and_partial_group():
    blob = b"\0\0\0\0ABCD\0\0\0\0xy"
    import base64

    enc = base64.a85encode(blob) + b"~>"
    assert P._ascii85_decode(enc) == blob
    assert P._ascii85_decode(b"z~>") == b"\0\0\0\0"
    with pytest.raises(ValueError):
        P._ascii85_decode(b"\x7f~>")


def test_runlength_round_trip_and_eod():
    blob = b"aaaaabcdefbbbbbbbb" + bytes(range(200)) + b"\xff" * 300
    assert P._runlength_decode(P._runlength_encode(blob)) == blob
    # EOD stops decoding
    assert P._runlength_decode(b"\x02abc\x80IGNORED") == b"abc"


def test_ascii_hex_whitespace_and_odd_pad():
    assert P._ascii_hex_decode(b"48 65 6c6C 6f>") == b"Hello"
    assert P._ascii_hex_decode(b"7>") == b"\x70"


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_predictors_row_filters(ft):
    # forward-apply each PNG filter by hand on two 4-byte rows, then
    # check _unpredict inverts it
    rows = [bytes([10, 20, 200, 250]), bytes([5, 130, 7, 255])]
    bpp = 1
    out = bytearray()
    prior = bytes(4)
    for row in rows:
        out.append(ft)
        for i in range(4):
            a = row[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[i] - pred) & 0xFF)
        prior = row
    got = P._unpredict(bytes(out), {"Predictor": 10 + ft, "Columns": 4})
    assert got == b"".join(rows)


def test_tiff_predictor_2():
    rows = [bytes([100, 10, 10, 236]), bytes([1, 2, 3, 4])]
    fwd = bytearray()
    for row in rows:
        prev = 0
        for v in row:
            fwd.append((v - prev) & 0xFF)
            prev = v
    got = P._unpredict(bytes(fwd), {"Predictor": 2, "Columns": 4})
    assert got == b"".join(rows)


def test_predictor_rejects_non_8bit():
    with pytest.raises(ValueError, match="BitsPerComponent"):
        P._unpredict(b"\x00\x00", {"Predictor": 12, "BitsPerComponent": 4})


# ---------------------------------------------------------------------------
# fonts: base encodings, /Differences, ToUnicode forms
# ---------------------------------------------------------------------------


def _one_page_pdf(font_obj: dict, content: bytes) -> bytes:
    objs = {
        1: {"Type": P.Name("Catalog"), "Pages": P.Ref(2, 0)},
        2: {"Type": P.Name("Pages"), "Kids": [P.Ref(3, 0)], "Count": 1},
        3: {
            "Type": P.Name("Page"),
            "Parent": P.Ref(2, 0),
            "Resources": {"Font": {"F1": P.Ref(5, 0)}},
            "Contents": P.Ref(4, 0),
        },
        4: ({"Length": len(content)}, content),
        5: font_obj,
    }
    return P._assemble_classic(objs)


def test_differences_encoding_with_uni_names():
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "BaseFont": P.Name("Helvetica"),
        "Encoding": {
            "BaseEncoding": P.Name("WinAnsiEncoding"),
            "Differences": [
                65, P.Name("plusminus"), P.Name("uni4F60"),
                200, P.Name("Euro"),
            ],
        },
    }
    content = b"BT /F1 12 Tf (A B \xc8 rest) Tj ET"
    # A(65)->±, B(66)->U+4F60, 0xC8(200)->€; other bytes via WinAnsi
    assert P.extract_pdf_text(_one_page_pdf(font, content)) == "± 你 € rest"


def test_unknown_glyph_name_decodes_empty_not_mojibake():
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": {
            "BaseEncoding": P.Name("WinAnsiEncoding"),
            "Differences": [65, P.Name("notarealglyphname")],
        },
    }
    content = b"BT /F1 9 Tf (xAy) Tj ET"
    assert P.extract_pdf_text(_one_page_pdf(font, content)) == "xy"


def test_macroman_and_standard_encodings():
    # MacRoman 0xA0 = † ; StandardEncoding 0xB1 = en dash
    mac = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("MacRomanEncoding"),
    }
    assert (
        P.extract_pdf_text(_one_page_pdf(mac, b"BT /F1 9 Tf (\xa0) Tj ET"))
        == "†"
    )
    std = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("StandardEncoding"),
    }
    assert (
        P.extract_pdf_text(_one_page_pdf(std, b"BT /F1 9 Tf (\xb1) Tj ET"))
        == "–"
    )


def test_tounicode_bfchar_and_bfrange_forms():
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <41> <0042> <42> <00480069> endbfchar\n"
        b"2 beginbfrange\n"
        b"<50> <52> <0061>\n"
        b"<60> <61> [<005A> <0079>]\n"
        b"endbfrange\nendcmap"
    )
    parsed = P.parse_tounicode_cmap(cmap)
    assert parsed.code_lens == {1}
    dec = P._FontDecoder(parsed, None, 1)
    # bfchar: A->B, B->"Hi"; bfrange inc: P,Q,R -> a,b,c; array: `,a -> Z,y
    assert dec.decode(b"AB") == "BHi"
    assert dec.decode(b"PQR") == "abc"
    assert dec.decode(b"\x60\x61") == "Zy"


def test_tounicode_two_byte_identity_range_stays_compact():
    parsed = P.parse_tounicode_cmap(P._IDENTITY_TOUNICODE)
    assert parsed.code_lens == {2}
    assert len(parsed.ranges) == 1 and not parsed.chars
    dec = P._FontDecoder(parsed, None, 2)
    assert dec.decode("héllo ☃".encode("utf-16-be")) == "héllo ☃"
    # surrogate pairs re-join
    assert dec.decode("\U0001F600".encode("utf-16-be")) == "\U0001F600"


# ---------------------------------------------------------------------------
# interpreter details
# ---------------------------------------------------------------------------


def test_quote_ops_and_tstar_break_lines():
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("WinAnsiEncoding"),
    }
    content = (
        b"BT /F1 12 Tf (one) Tj T* (two) Tj (three) ' 2 3 (four) \" ET"
    )
    assert (
        P.extract_pdf_text(_one_page_pdf(font, content))
        == "one\ntwo\nthree\nfour"
    )


def test_q_Q_restore_font_state():
    objs_font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("MacRomanEncoding"),
    }
    # inside q/Q the (undefined) F9 falls back; after Q, F1 restores
    content = b"BT /F1 12 Tf q /F9 8 Tf Q (\xa0) Tj ET"
    assert P.extract_pdf_text(_one_page_pdf(objs_font, content)) == "†"


def test_inline_image_is_skipped():
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("WinAnsiEncoding"),
    }
    content = (
        b"BT /F1 12 Tf (before) Tj ET "
        b"BI /W 2 /H 2 /BPC 8 /CS /G ID \x00\x01(\xff\xfe EI "
        b"BT /F1 12 Tf T* (after) Tj ET"
    )
    assert P.extract_pdf_text(_one_page_pdf(font, content)) == "before\nafter"


def test_multi_page_and_contents_array():
    c1 = b"BT /F1 12 Tf (page one) Tj ET"
    # the array split must fall BETWEEN lexical tokens (§7.8.2): here
    # between the string operand and its Tj operator
    c2a = b"BT /F1 12 Tf (page two)"
    c2b = b"Tj ET"
    objs = {
        1: {"Type": P.Name("Catalog"), "Pages": P.Ref(2, 0)},
        2: {
            "Type": P.Name("Pages"),
            "Kids": [P.Ref(3, 0), P.Ref(6, 0)],
            "Count": 2,
            # Resources inherited by both pages (§7.7.3.4)
            "Resources": {"Font": {"F1": P.Ref(9, 0)}},
        },
        3: {"Type": P.Name("Page"), "Parent": P.Ref(2, 0), "Contents": P.Ref(4, 0)},
        4: ({"Length": len(c1)}, c1),
        6: {
            "Type": P.Name("Page"),
            "Parent": P.Ref(2, 0),
            "Contents": [P.Ref(7, 0), P.Ref(8, 0)],
        },
        7: ({"Length": len(c2a)}, c2a),
        8: ({"Length": len(c2b)}, c2b),
        9: {
            "Type": P.Name("Font"),
            "Subtype": P.Name("Type1"),
            "Encoding": P.Name("WinAnsiEncoding"),
        },
    }
    data = P._assemble_classic(objs)
    assert P.extract_pdf_text(data) == "page one\npage two"


# ---------------------------------------------------------------------------
# lexer corners
# ---------------------------------------------------------------------------


def test_literal_string_octal_and_continuation():
    lex = P._Lexer(rb"(\101\102\()")
    assert lex.parse_literal_string() == b"AB("
    lex = P._Lexer(b"(one\\\ntwo)")
    assert lex.parse_literal_string() == b"onetwo"
    lex = P._Lexer(b"(raw\rEOL)")
    assert lex.parse_literal_string() == b"raw\nEOL"


def test_name_hex_escape_and_refs():
    lex = P._Lexer(b"/A#20B")
    assert lex.parse_name() == "A B"
    lex = P._Lexer(b"12 0 R")
    obj = lex.parse_object()
    assert isinstance(obj, P.Ref) and obj.num == 12
    # a bare number followed by a non-R token stays a number
    lex = P._Lexer(b"12 0 obj")
    assert lex.parse_object() == 12


def test_dict_and_nested_array_parse():
    lex = P._Lexer(b"<< /A [1 2 [3]] /B <</C (s)>> /D true >>")
    d = lex.parse_object()
    assert d["A"] == [1, 2, [3]] and d["B"]["C"] == b"s" and d["D"] is True


# ---------------------------------------------------------------------------
# the audit integration (the WET routing contract)
# ---------------------------------------------------------------------------


def test_audit_routes_pdf_ok_and_corrupt():
    good = H.synthesize_http_response(
        P.synthesize_pdf(42, "pdf body text"),
        content_type="application/pdf",
    )
    row = H._classify_and_extract(good)
    assert row["extract_ok"] and row["extract_class"] == "ok"
    assert row["text"] == EXPECTED(42, "pdf body text")
    assert row["mime"] == "application/pdf"

    bad = H.synthesize_http_response(
        b"%PDF-1.5 damaged beyond repair", content_type="application/pdf"
    )
    row = H._classify_and_extract(bad)
    assert not row["extract_ok"] and row["extract_class"] == "corrupt"


def test_pdf_behind_content_encoding_chain():
    # transport decode happens before format routing: a gzip'd PDF
    # must extract exactly like a plain one
    body = P.synthesize_pdf(17, "compressed transport")
    for enc in (None, "gzip", "compress"):
        r = H.synthesize_http_response(
            body, content_type="application/pdf", content_encoding=enc,
            chunked=(enc is None),
        )
        row = H._classify_and_extract(r)
        assert row["extract_class"] == "ok", enc
        assert row["text"] == EXPECTED(17, "compressed transport")


# ---------------------------------------------------------------------------
# round-12 review findings: hostile input stays ValueError / clean text
# ---------------------------------------------------------------------------


def test_hostile_nesting_is_value_error_not_recursion():
    blob = b"%PDF-1.4\n1 0 obj\n" + b"[" * 50_000 + b"\nendobj"
    with pytest.raises(ValueError):
        P.extract_pdf_text(blob)


def test_ascii85_final_group_overflow_is_value_error():
    with pytest.raises(ValueError, match="overflow"):
        P._ascii85_decode(b"uu~>")
    # end-to-end: the audit must classify, not crash
    data = P.build_pdf(["x"], content_filter="a85")
    bad = data.replace(b"~>", b"uu~>", 1)
    row = H._classify_and_extract(
        H.synthesize_http_response(bad, content_type="application/pdf")
    )
    assert row["extract_class"] == "corrupt"


def test_short_bfrange_array_decodes_empty_not_indexerror():
    cmap = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <40> <45> [<0041>] endbfrange"
    )
    dec = P._FontDecoder(P.parse_tounicode_cmap(cmap), None, 1)
    assert dec.decode(b"\x40\x43") == "A"


def test_lone_surrogates_never_reach_output():
    # bfchar destination is an unpaired high surrogate
    cmap = (
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfchar <41> <D800> endbfchar"
    )
    dec = P._FontDecoder(P.parse_tounicode_cmap(cmap), None, 1)
    out = dec.decode(b"AA")
    out.encode("utf-8")  # must not raise
    assert out == ""
    # Type0 without ToUnicode: GID bytes that look like surrogates
    dec2 = P._FontDecoder(None, None, 2)
    dec2.decode(b"\xd8\x00\x41\x42").encode("utf-8")  # must not raise


def test_truncated_content_stream_is_corrupt_not_partial_ok():
    # content stream cut mid-literal-string: the record must route to
    # `corrupt`, never ship the prefix tagged ok
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": P.Name("WinAnsiEncoding"),
    }
    content = b"BT /F1 12 Tf (kept) Tj T* (cut of"
    with pytest.raises(ValueError):
        P.extract_pdf_text(_one_page_pdf(font, content))


def test_objstm_header_disagreement_raises_not_substitutes():
    # xref says object N lives in this stream, the stream header
    # disagrees: substituting the index-matched object would ship
    # WRONG content tagged ok — must raise (routes to `corrupt`)
    data = P.build_pdf(["objstm strict"], xref_variant=2)
    doc = P.PdfDocument(data)
    locs = [
        (num, loc) for num, loc in doc.xref.items() if isinstance(loc, tuple)
    ]
    assert locs, "variant 2 must compress objects"
    _num, (_, stm, idx) = locs[0]
    with pytest.raises(ValueError, match="not found in object stream"):
        doc._get_from_objstm(stm, idx, want=999_999)


def test_surrogate_glyph_names_decode_empty():
    # a /Differences entry naming uniD800 must not place a lone
    # surrogate in the output (UTF-8-unencodable -> Arrow task death)
    assert P._glyph_to_unicode("uniD800") == ""
    assert P._glyph_to_unicode("u10FFFF") == "\U0010FFFF"
    assert P._glyph_to_unicode("uni0041") == "A"
    dec = P._FontDecoder(None, {65: P._glyph_to_unicode("uniD800")}, 1)
    dec.decode(b"A").encode("utf-8")  # must not raise
    font = {
        "Type": P.Name("Font"),
        "Subtype": P.Name("Type1"),
        "Encoding": {
            "BaseEncoding": P.Name("WinAnsiEncoding"),
            "Differences": [65, P.Name("uniD800")],
        },
    }
    out = P.extract_pdf_text(
        _one_page_pdf(font, b"BT /F1 9 Tf (xAy) Tj ET")
    )
    out.encode("utf-8")
    assert out == "xy"


def test_two_page_variant_same_closed_form():
    lines = ["alpha", "beta", "gamma"]
    for xv in (0, 1, 2):
        for t0 in (False, True):
            data = P.build_pdf(
                lines, xref_variant=xv, force_type0=t0, two_pages=True
            )
            assert P.extract_pdf_text(data) == "alpha\nbeta\ngamma", (xv, t0)
            # via the parsed tree — in the ObjStm variant the page
            # dicts are compressed, so raw-byte grep can't see them
            assert len(P.PdfDocument(data).pages()) == 2
    # the fixture's %17 rule rides the same closed form end-to-end
    for doc_id in (17, 34, 170, 187):
        text = f"body {doc_id}"
        got = P.extract_pdf_text(P.synthesize_pdf(doc_id, text))
        assert got == EXPECTED(doc_id, text)


def _incremental_update(base: bytes, new_content: bytes) -> bytes:
    """Append-style update replacing object 4 (the content stream) —
    the §7.5.6 incremental-save layout: new object, new xref section,
    trailer /Prev pointing at the previous table."""
    import re

    old_xref = int(re.search(rb"startxref\s+(\d+)", base).group(1))
    out = bytearray(base)
    off4 = len(out)
    out += P._obj_bytes(4, ({"Length": len(new_content)}, new_content))
    xref_off = len(out)
    out += b"xref\n4 1\n" + f"{off4:010d} 00000 n \n".encode()
    out += b"trailer\n" + P._ser(
        {"Size": 6, "Root": P.Ref(1, 0), "Prev": old_xref}
    )
    out += f"\nstartxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


def test_incremental_update_newest_object_wins():
    base = P.build_pdf(["original text"], content_filter="none")
    upd = _incremental_update(
        base, b"BT /F1 12 Tf 72 720 Td (updated text) Tj ET"
    )
    assert P.extract_pdf_text(upd) == "updated text"
    # and the rebuild-by-scan fallback agrees (last obj marker wins,
    # matching incremental-save semantics) when the xref chain breaks
    broken = upd.replace(b"startxref", b"startxrEf")
    assert P.extract_pdf_text(broken) == "updated text"
