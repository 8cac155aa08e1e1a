"""Avro Object Container File interchange (restricted profile,
stdlib-only) — the Kafka-ecosystem row format (r11 verdict "missing"
item 4).

The sandbox bundles the Avro LIBRARY jars (avro-1.12.1 via Hadoop)
but NOT the ``spark-avro`` datasource module, so ``spark.read
.format("avro")`` is unavailable. Rather than documenting a gap, this
module implements the container format itself under the same
restricted-profile stdlib-codec discipline as the PNG/JPEG/WAV/Y4M
decoders in operators/multimodal.py:

- FLAT record schemas over the primitive types a tabular interchange
  needs: ``long``, ``string``, ``double``, ``boolean`` (nullable via
  the standard ``["null", T]`` union);
- ``null`` and ``deflate`` codecs (raw DEFLATE, wbits=-15 — the two
  codecs every Avro implementation must support);
- spec-faithful wire format: ``Obj\\x01`` magic, file-metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker,
  blocks of (record count, byte size, records, sync) with zigzag
  varint longs, length-prefixed UTF-8 strings, little-endian IEEE
  doubles — readable by any stock Avro reader (spec compliance is
  pinned in tests/test_avro.py against the BUNDLED JVM avro jar via
  py4j where available).

Spark integration is one file per partition on write (mapInPandas +
TaskContext partition id — the hive-layout sink discipline) and
``binaryFile`` scan + Arrow-batched parse on read, so both directions
are distributed and the 100 TB posture matches the other
source/sink operators (no driver-side row traffic).

Reference behavior: the reference stack's Glue jobs move data between
row formats via catalog tables (reference repo: CDK/cdk/cdk_stack.py
crawler/job wiring); Avro is the row-interchange analogue.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"Obj\x01"
#: Deterministic sync marker — exports are diffable (the manifest
#: discipline); the spec only requires 16 random-ish bytes per file.
SYNC = bytes.fromhex("73706172366772616674617672306366")

_SPARK_TO_AVRO = {
    "bigint": "long",
    "long": "long",
    "int": "long",
    "string": "string",
    "double": "double",
    "boolean": "boolean",
}


def _write_varint(out: io.BytesIO, n: int) -> None:
    """Avro long: zigzag then little-endian base-128 varint."""
    z = (n << 1) ^ (n >> 63)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = z = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated avro varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("avro varint too long")
    return (z >> 1) ^ -(z & 1), pos


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_varint(out, len(b))
    out.write(b)


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_varint(buf, pos)
    if n < 0 or pos + n > len(buf):
        raise ValueError("truncated avro bytes")
    return buf[pos : pos + n], pos + n


def avro_schema_json(fields: list[tuple[str, str, bool]],
                     name: str = "row") -> str:
    """Avro record schema JSON from (name, primitive type, nullable)
    triples — nullable fields use the standard ["null", T] union."""
    fs = [
        {"name": n, "type": (["null", t] if nullable else t)}
        for n, t, nullable in fields
    ]
    return json.dumps(
        {"type": "record", "name": name, "fields": fs},
        sort_keys=True,
    )


def _encode_value(out: io.BytesIO, t: str, nullable: bool, v) -> None:
    if nullable:
        if v is None:
            _write_varint(out, 0)  # union branch 0 = null
            return
        _write_varint(out, 1)
    elif v is None:
        raise ValueError("None in non-nullable avro field")
    if t == "long":
        _write_varint(out, int(v))
    elif t == "string":
        _write_bytes(out, str(v).encode("utf-8"))
    elif t == "double":
        out.write(struct.pack("<d", float(v)))
    elif t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    else:
        raise ValueError(f"unsupported avro type {t}")


def _decode_value(buf: bytes, pos: int, t: str, nullable: bool):
    if nullable:
        branch, pos = _read_varint(buf, pos)
        if branch == 0:
            return None, pos
        if branch != 1:
            raise ValueError("bad union branch")
    if t == "long":
        return _read_varint(buf, pos)
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    if t == "double":
        if pos + 8 > len(buf):
            raise ValueError("truncated avro double")
        return struct.unpack("<d", buf[pos : pos + 8])[0], pos + 8
    if t == "boolean":
        if pos >= len(buf):
            raise ValueError("truncated avro boolean")
        return buf[pos] == 1, pos + 1
    raise ValueError(f"unsupported avro type {t}")


def write_avro_ocf_stream(
    out,
    records: Iterator[dict],
    fields: list[tuple[str, str, bool]],
    codec: str = "null",
    block_records: int = 1000,
) -> int:
    """Stream records (dicts) into an open binary file object as a
    multi-block Object Container File; returns the record count.
    Memory is bounded by one uncompressed block (``block_records``
    rows), never the whole partition — the OCF format is natively
    append-per-block, so arbitrarily large partitions stream through
    a fixed-size buffer."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec}")
    out.write(MAGIC)
    meta = {
        "avro.schema": avro_schema_json(fields).encode(),
        "avro.codec": codec.encode(),
    }
    _write_varint(out, len(meta))
    for k in sorted(meta):
        _write_bytes(out, k.encode())
        _write_bytes(out, meta[k])
    _write_varint(out, 0)
    out.write(SYNC)
    block, n_in_block, total = io.BytesIO(), 0, 0

    def flush():
        nonlocal block, n_in_block
        if not n_in_block:
            return
        data = block.getvalue()
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            data = c.compress(data) + c.flush()
        _write_varint(out, n_in_block)
        _write_varint(out, len(data))
        out.write(data)
        out.write(SYNC)
        block, n_in_block = io.BytesIO(), 0

    for rec in records:
        for name, t, nullable in fields:
            _encode_value(block, t, nullable, rec[name])
        n_in_block += 1
        total += 1
        if n_in_block >= block_records:
            flush()
    flush()
    return total


def write_avro_ocf(
    records: Iterator[dict],
    fields: list[tuple[str, str, bool]],
    codec: str = "null",
    block_records: int = 1000,
) -> bytes:
    """Serialize records (dicts) to one in-memory Object Container
    File payload (the test/fixture convenience; the sink streams via
    :func:`write_avro_ocf_stream`)."""
    out = io.BytesIO()
    write_avro_ocf_stream(out, records, fields, codec, block_records)
    return out.getvalue()


def read_avro_ocf(payload: bytes) -> tuple[list[tuple[str, str, bool]],
                                           list[dict]]:
    """Parse one OCF payload -> (fields, records). Malformed input
    raises ValueError (callers quarantine, the codec discipline)."""
    buf = bytes(payload)
    if buf[:4] != MAGIC:
        raise ValueError("not an avro object container file")
    pos, meta = 4, {}
    while True:
        n, pos = _read_varint(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte size
            n, pos = -n, _read_varint(buf, pos)[1]
        for _ in range(n):
            k, pos = _read_bytes(buf, pos)
            v, pos = _read_bytes(buf, pos)
            meta[k.decode()] = v
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec}")
    if schema.get("type") != "record":
        raise ValueError("only flat record schemas supported")
    fields: list[tuple[str, str, bool]] = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            nn = [x for x in t if x != "null"]
            if len(t) != 2 or "null" not in t or len(nn) != 1:
                raise ValueError("only [null, T] unions supported")
            fields.append((f["name"], nn[0], True))
        else:
            fields.append((f["name"], t, False))
    sync = buf[pos : pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _read_varint(buf, pos)
        size, pos = _read_varint(buf, pos)
        data = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            data = zlib.decompress(data, -15)
        if buf[pos : pos + 16] != sync:
            raise ValueError("avro sync marker mismatch")
        pos += 16
        bp = 0
        for _ in range(count):
            rec = {}
            for name, t, nullable in fields:
                rec[name], bp = _decode_value(data, bp, t, nullable)
            records.append(rec)
        if bp != len(data):
            raise ValueError("avro block has trailing bytes")
    return fields, records


def df_avro_fields(df: DataFrame) -> list[tuple[str, str, bool]]:
    """(name, avro type, nullable) triples from a DataFrame schema —
    the restricted profile rejects nested/unsupported types loudly."""
    out = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(f"unsupported avro interchange type {t}")
        out.append((f.name, _SPARK_TO_AVRO[t], f.nullable))
    return out


def write_avro_dir(df: DataFrame, out_dir: str,
                   codec: str = "deflate") -> None:
    """Distributed Avro sink: one OCF file per partition, written by
    the executors (TaskContext partition id names the file — the
    partitioned-parquet sink discipline, no driver row traffic).

    Cluster posture: ``out_dir`` must be a SHARED filesystem visible
    from every executor (NFS/FUSE mount; local[?] trivially
    qualifies) — executors write with plain ``open()``, there is no
    object-store protocol here. Memory is bounded: rows stream from
    each Arrow batch straight into the OCF block buffer
    (:func:`write_avro_ocf_stream`), never the whole partition.
    Task commit is temp-then-rename: each attempt writes
    ``.part-NNNNN-<attempt>.avro.tmp`` and atomically
    ``os.replace``s it onto the final name, so speculative twin
    attempts cannot interleave bytes — the last completed attempt
    wins with a whole, valid file."""
    import itertools

    import pandas as pd
    from pyspark import TaskContext

    fields = df_avro_fields(df)
    os.makedirs(out_dir, exist_ok=True)
    names = [n for n, _, _ in fields]

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId()

        def rows() -> Iterator[dict]:
            for pdf in it:
                for rec in pdf[names].to_dict("records"):
                    yield {k: (None if pd.isna(v) else v)
                           for k, v in rec.items()}

        row_it = rows()
        try:
            first = next(row_it)
        except StopIteration:
            yield pd.DataFrame({"part": [pid], "n_rows": [0]})
            return
        final = os.path.join(out_dir, f"part-{pid:05d}.avro")
        tmp = os.path.join(
            out_dir, f".part-{pid:05d}-{tc.taskAttemptId()}.avro.tmp"
        )
        try:
            with open(tmp, "wb") as f:
                n = write_avro_ocf_stream(
                    f, itertools.chain([first], row_it), fields,
                    codec=codec,
                )
            os.replace(tmp, final)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        yield pd.DataFrame({"part": [pid], "n_rows": [n]})

    df.mapInPandas(write_part, "part int, n_rows long").collect()


def read_avro_dir(spark, in_dir: str, schema_ddl: str) -> DataFrame:
    """Distributed Avro source: binaryFile scan (splittable file
    LISTING, one task per OCF) + Arrow-batched parse. ``schema_ddl``
    declares the expected columns (e.g. ``"doc_id long, text
    string"``); fields are matched by name."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(in_dir)
        .select("content")
    )
    cols = [c.strip().split()[0] for c in schema_ddl.split(",")]

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                _, records = read_avro_ocf(content)
                yield pd.DataFrame(
                    {c: [r.get(c) for r in records] for c in cols}
                )

    return files.mapInPandas(parse, schema_ddl)
