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


def test_session_window_stream_equals_batch(spark, events_parquet_dir):
    """Built-in session_window: streaming result (complete mode, all
    sessions closed at end of available data) == batch result."""
    from aws_de_final_project_spark.streaming.windows import session_stats

    batch_df = spark.read.parquet(events_parquet_dir)
    expected = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in session_stats(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(events_parquet_dir)
    )
    agg = session_stats(stream.withWatermark("ts", "0 seconds"))
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, str(r.session_start)): (str(r.session_end), r.n_events)
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }
    assert got == expected


def test_stateful_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionization: with time-ordered file
    arrival, every gap-closed session must match the batch
    (session_window) ground truth exactly; nothing may be emitted
    that batch doesn't have."""
    import os
    import time

    from aws_de_final_project_spark.sources.registry import load_tables
    from aws_de_final_project_spark.streaming.stateful import sessionize_stateful
    from aws_de_final_project_spark.streaming.windows import session_stats

    t = load_tables(spark, "/root/testdata/sf0.001", ("events",), register_views=False)
    events = t["events"].select("user_id", "ts", "value")

    # land the source as 3 files in ts order with increasing mtimes so
    # the file source delivers them as ordered micro-batches
    src = str(tmp_path / "sess_src")
    from pyspark.sql import functions as F2

    with_us = events.withColumn("_us", F2.unix_micros("ts"))
    q1, q2 = with_us.approxQuantile("_us", [0.33, 0.66], 0.0)
    parts = [
        with_us.filter(F2.col("_us") <= q1).drop("_us"),
        with_us.filter((F2.col("_us") > q1) & (F2.col("_us") <= q2)).drop("_us"),
        with_us.filter(F2.col("_us") > q2).drop("_us"),
    ]
    os.makedirs(src)
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}")
    paths = []
    for i in range(3):
        d = f"{src}/part{i}"
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = f"{src}/f{i}.parquet"
        os.rename(f"{d}/{f}", dst)
        now = time.time()
        os.utime(dst, (now + i * 10, now + i * 10))
        paths.append(dst)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = sessionize_stateful(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM stateful_sess").collect()

    truth = {
        (r.user_id, str(r.session_start)): (
            str(r.session_end),
            r.n_events,
            round(r.sum_value, 6),
        )
        for r in session_stats(events).collect()
    }
    assert got, "no sessions emitted"
    for r in got:
        key = (r.user_id, str(r.session_start))
        assert key in truth, f"spurious session {key}"
        end, n, sv = truth[key]
        assert (str(r.session_end), r.n_events, round(r.sum_value, 6)) == (
            end,
            n,
            sv,
        ), f"session mismatch for {key}"
    # with ts-ordered arrival, all but each user's final session close
    # by gap; most of the ground truth must have been emitted
    n_users = events.select("user_id").distinct().count()
    assert len(got) >= len(truth) - n_users
