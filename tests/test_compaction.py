"""Small-file compaction + JSONL corrupt-record capture
(sources/compaction.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_de_final_project_spark.sources.compaction import (
    compact_parquet,
    list_parquet_files,
    read_jsonl,
    split_corrupt,
)


def test_compact_reduces_file_count(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "compact")
    # 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(src)
    assert len(list_parquet_files(src)) == 40
    n = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert n == 1
    assert len(list_parquet_files(dst)) == 1
    # content preserved exactly
    a = sorted(r["id"] for r in spark.read.parquet(src).collect())
    b = sorted(r["id"] for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compact_scales_file_count_with_bytes(spark, tmp_path):
    src, dst = str(tmp_path / "frag2"), str(tmp_path / "compact2")
    spark.range(0, 50000).withColumn(
        "payload", F.concat_ws("", *[F.md5(F.col("id").cast("string"))] * 8)
    ).repartition(30).write.parquet(src)
    total = sum(b for _, b in list_parquet_files(src))
    target = max(total // 3, 1)
    n = compact_parquet(spark, src, dst, target_file_bytes=target)
    assert 3 <= n <= 4  # ceil(total/target)
    assert len(list_parquet_files(dst)) == n


def test_compact_preserves_hive_partitions(spark, tmp_path):
    src, dst = str(tmp_path / "hive"), str(tmp_path / "hive_out")
    df = spark.range(0, 1000).withColumn("part", (F.col("id") % 3).cast("int"))
    df.repartition(20).write.partitionBy("part").parquet(src)
    compact_parquet(
        spark, src, dst, target_file_bytes=64 * 1024 * 1024,
        partition_cols=("part",),
    )
    subdirs = sorted(
        d for d in os.listdir(dst) if d.startswith("part=")
    )
    assert subdirs == ["part=0", "part=1", "part=2"]
    back = spark.read.parquet(dst)
    assert back.count() == 1000
    assert back.groupBy("part").count().count() == 3


def test_jsonl_corrupt_capture(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    lines = [
        json.dumps({"doc_id": 1, "text": "hello"}),
        '{"doc_id": 2, "text": "ok"}',
        '{"doc_id": 3, "text": BROKEN',          # malformed
        "not json at all",                        # malformed
        json.dumps({"doc_id": 4}),                # missing field -> NULL text
    ]
    with open(p, "w") as f:
        f.write("\n".join(lines))
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = read_jsonl(spark, p, schema)
    good, bad = split_corrupt(df)
    assert good.count() == 3
    assert bad.count() == 2
    assert set(good.columns) == {"doc_id", "text"}
    raw = {r["_corrupt_record"] for r in bad.collect()}
    assert "not json at all" in raw
    # missing-field row is GOOD (schema nullability), not corrupt
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 4}
