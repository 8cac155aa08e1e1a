"""JSONL source/sink (sources/jsonl): roundtrip fidelity, explicit-
schema reads, corrupt-line quarantine routing, shard-count control,
and gzip transparency."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from aws_de_final_project_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    write_jsonl,
)

DDL = "doc_id bigint, text string, tags array<string>"


def test_roundtrip_with_complex_columns(spark, tmp_path):
    rows = [
        (1, "hello world", ["a", "b"]),
        (2, "unicode ünïcødé 中文", []),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, DDL)
    out = str(tmp_path / "docs")
    write_jsonl(df, out, n_shards=2, compression=None)
    back = read_jsonl(spark, out, schema=DDL)
    assert sorted(map(tuple, back.collect())) == sorted(rows)
    assert len(glob.glob(os.path.join(out, "part-*"))) == 2


def test_gzip_shards_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
        F.array(F.lit("x")).alias("tags"),
    )
    out = str(tmp_path / "gz")
    write_jsonl(df, out, n_shards=3)  # default gzip
    assert glob.glob(os.path.join(out, "part-*.gz"))
    assert read_jsonl(spark, out, schema=DDL).count() == 100


def test_corrupt_lines_dropped_or_quarantined(spark, tmp_path):
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok", "tags": []}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "tags": ["t"]}\n'
        '{"doc_id": "NOT A NUMBER", "text": "bad type", "tags": []}\n'
    )
    clean = read_jsonl(spark, str(src), schema=DDL)
    assert CORRUPT_COL not in clean.columns
    assert sorted(r.doc_id for r in clean.collect()) == [1, 2]
    # quarantine path: the text+from_json reader has no corrupt-only
    # query restriction, so a dead-letter count is a plain filter
    quarantine = read_jsonl(spark, str(src), schema=DDL, keep_corrupt=True)
    bad = quarantine.filter(F.col(CORRUPT_COL).isNotNull())
    raw = [r[CORRUPT_COL] for r in bad.collect()]
    assert len(raw) == 2  # the non-JSON line and the type mismatch
    # the raw line survives for forensics
    assert any("not json" in x for x in raw), raw


def test_no_shuffle_when_shards_unset(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS doc_id", "'x' AS text")
    out = str(tmp_path / "nosh")
    write_jsonl(df, out, n_shards=None, compression=None)
    back = read_jsonl(spark, out, schema="doc_id bigint, text string")
    assert back.count() == 10
