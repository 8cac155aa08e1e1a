"""WARC source (sources/warc): roundtrip through the restricted
WARC/1.x profile, gzip members, HTTP payload splitting, corrupt-record
quarantine with resync, and the no-shuffle plan pin. The oracled
driver entry (warc_extract_stats) lives in plans/extensions.py with
parity in tests/test_oracle_parity.py."""

from __future__ import annotations

import gzip
import os

from aws_de_final_project_spark.sources import warc as W


def _record(i: int, body: bytes, http: bool = True) -> dict:
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        if http
        else body
    )
    return {
        "record_id": f"<urn:uuid:rec-{i}>",
        "target_uri": f"https://example.com/{i}",
        "payload": payload,
    }


def _member_bytes(records) -> bytes:
    import io
    import tempfile

    with tempfile.NamedTemporaryFile(delete=False) as fh:
        path = fh.name
    try:
        W.write_warc_member(path, iter(records))
        with open(path, "rb") as fh2:
            return fh2.read()
    finally:
        os.unlink(path)


def test_roundtrip_parse():
    recs = [_record(i, f"<p>doc {i}</p>".encode()) for i in range(3)]
    out = list(W.parse_warc_member(_member_bytes(recs), "m0"))
    assert len(out) == 3
    for i, r in enumerate(out):
        assert r["corrupt_reason"] is None
        assert r["record_id"] == f"<urn:uuid:rec-{i}>"
        assert r["target_uri"] == f"https://example.com/{i}"
        assert r["record_type"] == "response"
        assert r["http_status"] == 200
        assert r["http_body"] == f"<p>doc {i}</p>"
        assert r["content_length"] == len(r["payload"])


def test_gzip_member_and_non_http_payload():
    recs = [
        _record(0, b"<p>a</p>"),
        _record(1, b"\x00\x01raw bytes", http=False),
    ]
    data = gzip.compress(_member_bytes(recs), mtime=0)
    out = list(W.parse_warc_member(data, "m0.gz"))
    assert [r["corrupt_reason"] for r in out] == [None, None]
    assert out[0]["http_status"] == 200
    assert out[1]["http_status"] is None
    assert out[1]["http_body"] is None
    assert out[1]["payload"] == b"\x00\x01raw bytes"


def test_corrupt_records_quarantine_and_resync():
    good0 = _member_bytes([_record(0, b"<p>ok0</p>")])
    good1 = _member_bytes([_record(1, b"<p>ok1</p>")])
    # splice garbage + a record with a broken Content-Length between
    # two good records; both corruptions quarantine, both good
    # records still parse (resync at the next \r\nWARC/1. marker)
    bad_clen = good0.replace(b"Content-Length:", b"Content-Length: x;", 1)
    data = good0 + b"garbage not a record\r\n" + good1 + bad_clen
    out = list(W.parse_warc_member(data, "m"))
    reasons = [r["corrupt_reason"] for r in out]
    ok = [r for r in out if r["corrupt_reason"] is None]
    assert len(ok) == 2, reasons
    assert {r["record_id"] for r in ok} == {
        "<urn:uuid:rec-0>", "<urn:uuid:rec-1>"
    }
    bad = [r for r in out if r["corrupt_reason"] is not None]
    assert any("version line" in r["corrupt_reason"] for r in bad)
    assert any("Content-Length" in r["corrupt_reason"] for r in bad)


def test_truncated_payload_quarantines():
    full = _member_bytes([_record(0, b"<p>whole body</p>")])
    out = list(W.parse_warc_member(full[:-12], "m"))
    assert len(out) == 1
    assert "truncated payload" in out[0]["corrupt_reason"]


def test_read_warc_distributed(spark, tmp_path):
    # two members (one gzipped), read through binaryFile+mapInPandas
    d = tmp_path / "warcs"
    d.mkdir()
    W.write_warc_member(
        str(d / "a.warc"),
        iter([_record(i, f"<p>a{i}</p>".encode()) for i in range(4)]),
    )
    W.write_warc_member(
        str(d / "b.warc.gz"),
        iter([_record(10 + i, f"<p>b{i}</p>".encode()) for i in range(3)]),
        compress=True,
    )
    df = W.read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 7
    assert {r.http_status for r in rows} == {200}
    # quarantine plumbing: a corrupt member yields reason rows with
    # keep_corrupt=True and silently drops them by default
    with open(d / "c.warc", "wb") as fh:
        fh.write(b"not a warc at all")
    df2 = W.read_warc(spark, str(d), keep_corrupt=True)
    bad = [r for r in df2.collect() if r.corrupt_reason is not None]
    assert len(bad) == 1 and "version line" in bad[0].corrupt_reason
    assert W.read_warc(spark, str(d)).count() == 7
    # plan pin: parse is scan-side — no exchange anywhere
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_non_ascii_header_roundtrip():
    """WARC/1.0 headers are UTF-8: a non-ASCII WARC-Target-URI must
    survive a write -> parse roundtrip byte-losslessly (ADVICE r8:
    the parse side used latin-1 and mojibaked it)."""
    uri = "https://exämple.com/päth/ß?q=日本語"
    recs = [
        {
            "record_id": "<urn:uuid:rec-ü>",
            "target_uri": uri,
            "payload": b"HTTP/1.1 200 OK\r\n\r\nok",
        }
    ]
    out = list(W.parse_warc_member(_member_bytes(recs), "m0"))
    assert len(out) == 1
    assert out[0]["corrupt_reason"] is None
    assert out[0]["target_uri"] == uri
    assert out[0]["record_id"] == "<urn:uuid:rec-ü>"
