"""Restricted-profile PDF text extraction (sources/pdf): closed-form
fixture PDFs built by an INDEPENDENT test-side encoder drive the real
parser; rejection tests pin the quarantine contract (VERDICT r12
item 2)."""

import zlib

import pytest

from aws_de_final_project_spark.sources import pdf as P


def _xref_and_trailer(objs: dict[int, bytes], head: bytes,
                      trailer_extra: bytes = b"") -> bytes:
    """Assemble body + classic xref table + trailer from numbered
    object bodies (independent of the parser under test)."""
    out = bytearray(head)
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    maxn = max(objs)
    out += b"xref\n0 %d\n" % (maxn + 1)
    out += b"0000000000 65535 f \n"
    for num in range(1, maxn + 1):
        if num in offsets:
            out += b"%010d 00000 n \n" % offsets[num]
        else:
            out += b"0000000000 65535 f \n"
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R " % (maxn + 1)
        + trailer_extra
        + b">>\nstartxref\n%d\n%%%%EOF" % xref_at
    )
    return bytes(out)


def _stream_obj(content: bytes, flate: bool,
                indirect_len: int | None = None) -> bytes:
    data = zlib.compress(content) if flate else content
    filt = b"/Filter /FlateDecode " if flate else b""
    ln = (b"%d 0 R" % indirect_len) if indirect_len else b"%d" % len(data)
    return (b"<< /Length " + ln + b" " + filt + b">>\nstream\n"
            + data + b"\nendstream")


def _one_page_pdf(content: bytes, flate: bool = False,
                  trailer_extra: bytes = b"",
                  indirect_len: bool = False) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: _stream_obj(content, flate, indirect_len=5 if indirect_len
                       else None),
    }
    if indirect_len:
        data = zlib.compress(content) if flate else content
        objs[5] = b"%d" % len(data)
    return _xref_and_trailer(objs, b"%PDF-1.4\n", trailer_extra)


def test_text_operators_escapes_hex_and_flate():
    content = (
        rb"BT /F1 12 Tf (Lit \(paren\) \\ oct\101 end) Tj "
        rb"T* (second line) Tj "
        rb"[(kern) -120 (ed arr)] TJ "
        b"<48 657861> Tj "
        b"(outside quote follows) ' ET "
        b"(after ET ignored) Tj"
    )
    expected = (
        "Lit (paren) \\ octA end\nsecond line"
        "kerned arrHexa\noutside quote follows"
    )
    for flate in (False, True):
        pages = P.parse_pdf_pages(_one_page_pdf(content, flate=flate))
        assert pages == [expected]


def test_nested_page_tree_order_and_array_contents():
    c = [b"BT (p%d) Tj ET" % i for i in range(3)]
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [9 0 R 7 0 R] /Count 3 >>",
        9: b"<< /Type /Pages /Parent 2 0 R /Kids [3 0 R 5 0 R] "
           b"/Count 2 >>",
        3: b"<< /Type /Page /Parent 9 0 R /Contents 4 0 R >>",
        5: b"<< /Type /Page /Parent 9 0 R /Contents [6 0 R 10 0 R] >>",
        7: b"<< /Type /Page /Parent 2 0 R /Contents 8 0 R >>",
        4: _stream_obj(c[0], False),
        6: _stream_obj(b"BT (p1a", True),
        10: _stream_obj(b") Tj ET", True),
        8: _stream_obj(c[2], True),
    }
    pages = P.parse_pdf_pages(_xref_and_trailer(objs, b"%PDF-1.7\n"))
    # split /Contents array concatenates with a newline separator in
    # between, mid-token: "BT (p1a" + "\n" + ") Tj ET" -> "p1a\n"
    assert pages == ["p0", "p1a\n", "p2"]


def test_indirect_length_resolution():
    pages = P.parse_pdf_pages(
        _one_page_pdf(b"BT (len by ref) Tj ET", flate=True,
                      indirect_len=True)
    )
    assert pages == ["len by ref"]


@pytest.mark.parametrize(
    "mutate,reason",
    [
        (lambda b: b"NOPE" + b[4:], "bad magic"),
        (lambda b: b[:40], "truncated"),
        (lambda b: b.replace(b"xref\n0", b"9 0 obj\n0"), "xref stream"),
        (lambda b: b.replace(b"/FlateDecode", b"/LZWDecode\x20\x20"),
         "unsupported filter"),
        (lambda b: b.replace(zlib.compress(b"BT (x) Tj ET"),
                             b"\x00" * len(zlib.compress(b"BT (x) Tj ET"))),
         "corrupt deflate"),
    ],
)
def test_out_of_profile_rejections(mutate, reason):
    good = _one_page_pdf(b"BT (x) Tj ET", flate=True)
    with pytest.raises(ValueError):
        P.parse_pdf_pages(mutate(good))


def test_encrypted_rejected():
    pdf = _one_page_pdf(b"BT (secret) Tj ET",
                        trailer_extra=b"/Encrypt 99 0 R ")
    with pytest.raises(ValueError, match="encrypted"):
        P.parse_pdf_pages(pdf)


def test_incremental_update_prev_chain():
    """A /Prev-chained second xref section overrides object 4 — the
    incremental-save shape; newest section wins."""
    base = _one_page_pdf(b"BT (old text) Tj ET")
    first_xref_at = base.rindex(b"\nxref\n") + 1
    upd = bytearray(base)
    new4_at = len(upd)
    upd += b"4 0 obj\n" + _stream_obj(b"BT (new text) Tj ET", False)
    upd += b"\nendobj\n"
    xref_at = len(upd)
    upd += (b"xref\n4 1\n%010d 00000 n \ntrailer\n"
            b"<< /Size 5 /Root 1 0 R /Prev %d >>\nstartxref\n%d\n%%%%EOF"
            % (new4_at, first_xref_at, xref_at))
    assert P.parse_pdf_pages(bytes(upd)) == ["new text"]


def test_distributed_extraction_with_quarantine(spark):
    good = _one_page_pdf(b"BT (doc A) Tj T* (line 2) Tj ET", flate=True)
    bad = good[:60]
    enc = _one_page_pdf(b"BT (s) Tj ET", trailer_extra=b"/Encrypt 9 0 R ")
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad)), (3, bytearray(enc))],
        "doc_id long, payload binary",
    )
    rows = sorted(
        P.pdf_extract_pages(df, "doc_id", "payload").collect(),
        key=lambda r: (r.doc_id, r.page_idx or -1),
    )
    assert [(r.doc_id, r.page_idx, r.text) for r in rows] == [
        (1, 0, "doc A\nline 2"),
        (2, None, None),
        (3, None, None),
    ]
