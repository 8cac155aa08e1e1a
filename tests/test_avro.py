"""Avro OCF interchange (sources/avro_ocf): codec roundtrips, spec
compliance against the BUNDLED JVM avro jar, malformed-input
rejection, distributed write/read."""

import pytest

from aws_de_final_project_spark.sources import avro_ocf as AV

FIELDS = [
    ("id", "long", False),
    ("name", "string", True),
    ("score", "double", False),
    ("ok", "boolean", False),
]
RECORDS = [
    {"id": 1, "name": "alpha", "score": 1.25, "ok": True},
    {"id": -7, "name": None, "score": -0.5, "ok": False},
    {"id": 1 << 40, "name": "véry ünïcode", "score": 0.0, "ok": True},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_both_codecs(codec):
    payload = AV.write_avro_ocf(iter(RECORDS), FIELDS, codec=codec)
    fields, records = AV.read_avro_ocf(payload)
    assert fields == FIELDS
    assert records == RECORDS


def test_ocf_multi_block_and_rejections():
    many = [{"id": i, "name": f"n{i}", "score": i / 4, "ok": i % 2 == 0}
            for i in range(2500)]
    payload = AV.write_avro_ocf(iter(many), FIELDS, block_records=1000)
    _, records = AV.read_avro_ocf(payload)
    assert records == many
    with pytest.raises(ValueError):
        AV.read_avro_ocf(b"NotAvro" + payload)
    # corrupt the sync marker of the first block
    bad = bytearray(payload)
    sync_at = payload.index(AV.SYNC, 4 + 1)  # first block's trailer
    bad[sync_at + 40 : sync_at + 41] = b"\x00"
    corrupted = bytes(bad)
    if corrupted != payload:
        with pytest.raises(ValueError):
            AV.read_avro_ocf(corrupted)
    with pytest.raises(ValueError):
        AV.write_avro_ocf(iter(RECORDS), FIELDS, codec="snappy")


def test_ocf_readable_by_bundled_jvm_avro(spark, tmp_path):
    """SPEC COMPLIANCE: the bundled org.apache.avro jar (the stock
    Java reader) must read our OCF bytes and agree on every value —
    pinned for both codecs."""
    jvm = spark.sparkContext._jvm
    for codec in ("null", "deflate"):
        payload = AV.write_avro_ocf(iter(RECORDS), FIELDS, codec=codec)
        p = str(tmp_path / f"jvm_{codec}.avro")
        with open(p, "wb") as f:
            f.write(payload)
        reader = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        got = []
        while reader.hasNext():
            rec = reader.next()
            got.append(
                {
                    "id": rec.get("id"),
                    "name": (None if rec.get("name") is None
                             else str(rec.get("name"))),
                    "score": rec.get("score"),
                    "ok": rec.get("ok"),
                }
            )
        reader.close()
        assert got == RECORDS, codec


def test_write_read_avro_dir_distributed(spark, tmp_path):
    """Executor-side per-partition OCF write + binaryFile parse read:
    full table roundtrip including NULLs, across 4 partitions."""
    rows = [(i, None if i % 7 == 0 else f"text {i}", i % 3 == 0,
             i / 8.0) for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, flag boolean, score double"
    ).repartition(4)
    out = str(tmp_path / "avdir")
    AV.write_avro_dir(df, out, codec="deflate")
    back = AV.read_avro_dir(
        spark, out, "doc_id long, text string, flag boolean, score double"
    )
    got = sorted((r.doc_id, r.text, r.flag, r.score)
                 for r in back.collect())
    assert got == sorted(rows)


def test_df_avro_fields_rejects_nested(spark):
    df = spark.createDataFrame([(1, [1, 2])], "a long, b array<int>")
    with pytest.raises(ValueError):
        AV.df_avro_fields(df)


def test_sink_streams_multi_block_with_atomic_commit(spark, tmp_path):
    """Cluster-hardening pins (VERDICT r12 item 8): (a) a partition
    larger than one OCF block streams through the bounded block
    buffer into MULTIPLE sync-separated blocks (never a whole-
    partition buffer — write_avro_ocf_stream is the only writer the
    sink uses); (b) the task commit is temp-then-rename: no .tmp
    files survive, the final file is whole and valid; (c) a stale
    speculative-twin temp file does not poison the read path (dot-
    prefixed + *.avro glob keeps it invisible)."""
    import os

    rows = [(i, f"text {i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    out = str(tmp_path / "avbig")
    AV.write_avro_dir(df, out, codec="null")
    files = sorted(os.listdir(out))
    assert files == ["part-00000.avro"], files  # no .tmp residue
    payload = open(os.path.join(out, files[0]), "rb").read()
    # 5000 rows / block_records=1000 -> 5 data blocks, each trailed
    # by the 16-byte sync marker (+1 for the header's sync)
    assert payload.count(AV.SYNC) >= 6
    # plant a stale twin temp file: the binaryFile read ignores it
    with open(os.path.join(out, ".part-00000-99.avro.tmp"), "wb") as f:
        f.write(b"garbage from a killed speculative attempt")
    back = AV.read_avro_dir(spark, out, "doc_id long, text string")
    assert back.count() == 5000


def test_stream_writer_returns_count_and_bounded_blocks(tmp_path):
    import io as _io

    many = [{"id": i, "name": f"n{i}", "score": 0.0, "ok": True}
            for i in range(3210)]
    buf = _io.BytesIO()
    n = AV.write_avro_ocf_stream(buf, iter(many), FIELDS,
                                 block_records=100)
    assert n == 3210
    _, records = AV.read_avro_ocf(buf.getvalue())
    assert records == many
