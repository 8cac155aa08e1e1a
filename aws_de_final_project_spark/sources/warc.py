"""WARC (Web ARChive, ISO 28500) reader — the interchange format real
crawl corpora arrive in (Common Crawl ships ~100k gzipped WARC members
per monthly crawl).

North-star extension (the reference has no crawl surface): a
RESTRICTED-PROFILE WARC/1.x parser following the stdlib-codec
precedent of ``operators/multimodal.py`` — no new dependencies. The
profile covers what response-record processing needs:

* a record = ``WARC/1.0`` (or 1.1) version line, CRLF header lines
  ``Name: value``, a blank line, then EXACTLY ``Content-Length``
  payload octets, then the CRLF CRLF record separator;
* response records whose payload is an HTTP response get the status
  code and body split out (first ``\\r\\n\\r\\n`` boundary);
* anything that violates the profile becomes a QUARANTINE row
  (``corrupt_reason`` set) and the parser RESYNCS at the next
  ``\\r\\nWARC/1.`` marker, so one mangled record never poisons the
  rest of a 1 GB member — the dead-letter posture of
  ``sources/jsonl.py``.

Spark-first distribution: WARC members are read through the
``binaryFile`` source — ONE FILE PER TASK, which is the maximal
parallel grain anyway because the standard ``.warc.gz`` framing is a
single gzip stream (not splittable); a 100 TB crawl is ~100k x 1 GB
members, i.e. 100k-way parallelism with zero shuffles. Parsing runs
in ``mapInPandas`` (Arrow-batched bytes in, rows out); everything
downstream (``html_extract_text`` -> ``canonicalize_url`` -> host
stats) is the existing scan-side crawl family.

Reference parity note: the reference (zcauchon/AWS_DE_Final_Project)
ingests REST/CSV only; this source exists for the training-data
north star, not reference parity.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_body", T.StringType()),
        T.StructField("corrupt_reason", T.StringType()),
    ]
)

_MARKER = b"\r\nWARC/1."


def _parse_http(payload: bytes) -> tuple[int | None, str | None]:
    """Split an HTTP response payload into (status, body). Non-HTTP
    payloads return (None, None) — valid per WARC, the payload column
    still carries the bytes."""
    if not payload.startswith(b"HTTP/"):
        return None, None
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, None
    try:
        status = int(head.split(b"\r\n", 1)[0].split(b" ")[1])
    except (IndexError, ValueError):
        return None, None
    return status, body.decode("utf-8", errors="replace")


def parse_warc_member(data: bytes, name: str = "") -> Iterator[dict]:
    """Parse one (possibly gzipped) WARC member into record dicts
    matching WARC_SCHEMA. Pure Python over bytes — called inside the
    executors' mapInPandas batches by :func:`read_warc`, and directly
    by tests. Corrupt structures yield quarantine dicts and resync at
    the next record marker instead of raising."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
        except OSError as e:
            yield _corrupt(name, f"gzip: {e}")
            return
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (CRLFs)
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 7].startswith(b"WARC/1."):
            yield _corrupt(name, "no WARC/1.x version line at record start")
            pos = _resync(data, pos)
            continue
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield _corrupt(name, "unterminated header block")
            return
        headers: dict[str, str] = {}
        ok = True
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, sep, v = line.partition(b":")
            if not sep:
                yield _corrupt(name, f"malformed header line {line[:40]!r}")
                ok = False
                break
            # fold into the canonical lower-case key space. Values
            # decode as UTF-8 (WARC/1.0 §4 headers are UTF-8 — the
            # write side encodes them the same way, so a non-ASCII
            # WARC-Target-URI roundtrips losslessly; errors='replace'
            # keeps genuinely broken bytes from killing the member)
            headers[
                k.decode("utf-8", errors="replace").strip().lower()
            ] = v.decode("utf-8", errors="replace").strip()
        if not ok:
            pos = _resync(data, hdr_end)
            continue
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield _corrupt(name, "missing/non-integer Content-Length")
            pos = _resync(data, hdr_end)
            continue
        body_start = hdr_end + 4
        if body_start + clen > n:
            yield _corrupt(
                name,
                f"truncated payload: need {clen} bytes, "
                f"have {n - body_start}",
            )
            return
        payload = data[body_start : body_start + clen]
        status, http_body = _parse_http(payload)
        yield {
            "warc_file": name,
            "record_id": headers.get("warc-record-id"),
            "record_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_length": clen,
            "payload": payload,
            "http_status": status,
            "http_body": http_body,
            "corrupt_reason": None,
        }
        pos = body_start + clen


def _corrupt(name: str, reason: str) -> dict:
    return {
        "warc_file": name,
        "record_id": None,
        "record_type": None,
        "target_uri": None,
        "warc_date": None,
        "content_length": None,
        "payload": None,
        "http_status": None,
        "http_body": None,
        "corrupt_reason": reason,
    }


def _resync(data: bytes, pos: int) -> int:
    nxt = data.find(_MARKER, pos)
    return len(data) if nxt < 0 else nxt + 2


def read_warc(
    spark: SparkSession, path: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read WARC members under ``path`` (dir/glob; ``.warc`` and
    ``.warc.gz``) into one row per record.

    Distribution: ``binaryFile`` scan (one task per member — the
    natural grain, gzip members being unsplittable) -> ``mapInPandas``
    parse. No shuffle anywhere; at 100 TB parallelism equals the
    member count, which is how crawl archives are sharded by
    construction. Memory: one member is materialized per task
    (members are ~1 GB by convention — set
    ``spark.sql.files.maxPartitionBytes`` has no effect on binaryFile;
    executor memory must cover member size, the standard WARC
    processing constraint).

    ``keep_corrupt=False`` drops quarantine rows; ``True`` keeps them
    (``corrupt_reason`` non-null) for a dead-letter sink."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for b in batches:
            rows = []
            for name, content in zip(b["path"], b["content"]):
                rows.extend(parse_warc_member(bytes(content), str(name)))
            yield pd.DataFrame(rows, columns=cols)

    out = files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)
    if keep_corrupt:
        return out
    return out.filter(out.corrupt_reason.isNull()).drop("corrupt_reason")


def write_warc_member(
    out_path: str, records: Iterator[dict], compress: bool = False
) -> int:
    """Serialize records (dicts with ``record_id``, ``target_uri``,
    ``payload`` bytes, optional ``record_type``/``warc_date``) as one
    WARC/1.0 member. Driver-side fixture/egress plumbing — the engine
    consumes WARC, it does not produce it at scale (parquet is the
    hot-path sink); used by the oracle entry and tests to build
    deterministic members. Returns the record count."""
    buf = io.BytesIO()
    count = 0
    for r in records:
        payload = r["payload"]
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('record_type', 'response')}\r\n"
            f"WARC-Record-ID: {r['record_id']}\r\n"
            f"WARC-Target-URI: {r['target_uri']}\r\n"
            f"WARC-Date: {r.get('warc_date', '2026-01-01T00:00:00Z')}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8")
        buf.write(hdr)
        buf.write(payload)
        buf.write(b"\r\n\r\n")
        count += 1
    data = buf.getvalue()
    if compress:
        data = gzip.compress(data, mtime=0)
    with open(out_path, "wb") as fh:
        fh.write(data)
    return count
