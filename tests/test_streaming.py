"""Structured Streaming semantics: windowed aggregation equivalence
(stream == batch for the same plan) and watermark-bounded state."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from aws_de_final_project_spark.sources.registry import load_tables
from aws_de_final_project_spark.streaming.windows import (
    run_stream_to_memory,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_parquet_dir(spark, tmp_path_factory):
    """Re-land the events table as a micro-batched parquet dir (the
    nanos-ts original can't be stream-read directly)."""
    out = str(tmp_path_factory.mktemp("events_stream_src"))
    t = load_tables(spark, "/root/testdata/sf0.001", ("events",), register_views=False)
    t["events"].repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_stream_equals_batch(spark, events_parquet_dir):
    batch_df = spark.read.parquet(events_parquet_dir)
    expected = {
        (str(r.window_start), r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in windowed_event_counts(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .parquet(events_parquet_dir)
    )
    run_stream_to_memory(stream, "win_test")
    got = {
        (str(r.window_start), r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM win_test").collect()
    }
    assert got == expected


def test_incremental_ingest_is_exactly_once(spark, tmp_path):
    """File-source + checkpoint = Glue-bookmark parity (T1): a second
    run with no new files writes nothing; a new file adds only its
    own rows."""
    from pyspark.sql import types as T

    from aws_de_final_project_spark.streaming.ingest import incremental_csv_ingest

    src = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    (src / "f1.csv").write_text("a,b\n1,x\n2,y\n")

    incremental_csv_ingest(spark, str(src), out, ckpt, schema)
    assert spark.read.parquet(out).count() == 2

    incremental_csv_ingest(spark, str(src), out, ckpt, schema)  # no new files
    assert spark.read.parquet(out).count() == 2

    (src / "f2.csv").write_text("a,b\n3,z\n")
    incremental_csv_ingest(spark, str(src), out, ckpt, schema)
    got = sorted(r.a for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]
